// Shim: the reference's simdutil.h provides its own Transform1Reversed;
// the real contrib header is not needed for the scalar golden build.
#pragma once
#include "hwy/highway.h"
