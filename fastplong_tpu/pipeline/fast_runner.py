"""Host-side driver for the transfer-optimized device step.

Per-batch device<->host traffic is one packed uint8 input and one packed
int32 per-read output; the big statistic tensors live on-device (donated
carry per length bucket) and are fetched once at end of run, sliced under
the interconnect's large-transfer limit.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..common import PASS_FILTER
from .device import build_fast_step, init_stats_state, out_cap, _STAT_KEYS


class PackedResults:
    """Decoded view of one batch's packed per-read output."""

    def __init__(self, arr, cap, n_stages):
        self.cap = cap
        self.lo = arr[:, 0]
        self.hi = arr[:, 1]
        flags = arr[:, 2]
        self.null = (flags & 1).astype(bool)
        self.n_out = (flags >> 1) & 0x7
        self.poly = ((flags >> 4) & 0x7) - 1
        self.pre_median = (flags >> 8) & 0xFF
        self.poly_trim = arr[:, 3]
        self.adapter_trimmed = arr[:, 4]
        base = 5
        self.out_lo = arr[:, base + 0:base + cap * 6:6]
        self.out_hi = arr[:, base + 1:base + cap * 6:6]
        self.mask_lo = arr[:, base + 2:base + cap * 6:6]
        self.mask_hi = arr[:, base + 3:base + cap * 6:6]
        misc = arr[:, base + 4:base + cap * 6:6]
        self.region_no = arr[:, base + 5:base + cap * 6:6]
        self.code = misc & 0x3F
        self.out_tag = (misc >> 6) & 0x3
        self.passed = ((misc >> 8) & 1).astype(bool)
        self.is_parent = ((misc >> 9) & 1).astype(bool)
        self.active = ((misc >> 10) & 1).astype(bool)
        self.post_median = (misc >> 11) & 0xFF
        self.adapter_recs = arr[:, base + cap * 6:]


class DeviceStats:
    """Per-bucket device-resident accumulators with periodic drain."""

    # drain long before any int32 accumulator can overflow: per batch a
    # cycle-qual cell grows by <= B*93 (~400k), so ~5000 batches are safe
    DRAIN_EVERY = 4000

    def __init__(self):
        self.states = {}       # L -> device state pytree
        self.batch_counts = {}
        self.drained = {"pre": [], "post": []}  # list of numpy dicts

    def get(self, L):
        if L not in self.states:
            self.states[L] = init_stats_state(L)
            self.batch_counts[L] = 0
        return self.states[L]

    def put(self, L, state):
        self.states[L] = state
        self.batch_counts[L] += 1
        if self.batch_counts[L] >= self.DRAIN_EVERY:
            self._drain(L)

    def _fetch_side(self, side):
        """Fetch one side's arrays, slicing anything above ~4MB."""
        out = {}
        for k in _STAT_KEYS:
            a = side[k]
            n = a.size * 4
            if n > (4 << 20) and a.ndim == 2:
                out[k] = np.concatenate(
                    [np.asarray(a[i:i + 1]) for i in range(a.shape[0])])
            elif n > (4 << 20):
                step = (4 << 20) // 4
                out[k] = np.concatenate(
                    [np.asarray(a[i:i + step])
                     for i in range(0, a.shape[0], step)])
            else:
                out[k] = np.asarray(a)
        return out

    def _drain(self, L):
        st = self.states.pop(L)
        self.drained["pre"].append(self._fetch_side(st["pre"]))
        self.drained["post"].append(self._fetch_side(st["post"]))
        self.batch_counts[L] = 0

    def finish(self):
        """Drain everything; returns (pre_partials, post_partials) lists."""
        for L in list(self.states.keys()):
            self._drain(L)
        return self.drained["pre"], self.drained["post"]
