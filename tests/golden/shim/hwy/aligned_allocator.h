// Shim: plain new[] allocation is sufficient for the scalar golden build.
#pragma once
#include "hwy/highway.h"
