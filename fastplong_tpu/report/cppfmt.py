"""C++ iostream-compatible number formatting.

The reference writes doubles with default ostream precision (printf %g with
6 significant digits).  Python's %g implements the same rules, so report
output can match the reference byte-for-byte.
"""

import math


def fmt_double(x) -> str:
    x = float(x)
    if math.isnan(x):
        # x86 0.0/0.0 is -nan and libstdc++ prints it that way
        return "-nan" if math.copysign(1.0, x) < 0 else "nan"
    if math.isinf(x):
        return "inf" if x > 0 else "-inf"
    return "%g" % x


def fmt_double_list(values) -> str:
    return ",".join(fmt_double(v) for v in values)
