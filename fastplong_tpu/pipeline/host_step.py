"""Backend-free host execution of the stats-free fast step.

Runs the SAME kernel-chain source as the device path (pipeline/device.py
re-executed under the numpy shim, ops/npshim.py), so a wedged accelerator
link can never leave a run uncompletable — even on hosts whose jax install
exposes no CPU backend (the round-3 bench environment).  The reference's
bar is "fail loud, never crash uncontrolled" (src/util.h:270-273); this
path upgrades that to "always finish, byte-identical".

Output rows are bit-identical to the device step's stats-free rows
(pinned by tests/test_host_step.py).
"""

import threading

import numpy as np

_lock = threading.Lock()
_steps = {}   # frozen kernel params -> fast_nostats fn


def get_host_nostats_step(opt):
    """fast_nostats(outbuf, slot, packed, L) -> outbuf, all numpy."""
    from .device import kernel_params, _freeze
    key = _freeze(kernel_params(opt))
    with _lock:
        if key not in _steps:
            from ..ops import npshim
            dev_np = npshim.load("fastplong_tpu.pipeline.device")
            _steps[key] = dev_np.make_fast_fn(opt, with_stats=False)[0]
        return _steps[key]


def host_rows(opt, packed, L, n_fields):
    """Decoded [B, F] int32 result rows for one packed batch, no jax."""
    step = get_host_nostats_step(opt)
    outbuf = np.zeros((1, packed.shape[0], n_fields), np.int32)
    out = step(outbuf, np.int32(0), np.asarray(packed), L)
    return np.asarray(out[0], dtype=np.int32)
