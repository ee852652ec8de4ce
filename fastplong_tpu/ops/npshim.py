"""Backend-free numpy re-execution of the jnp kernel modules.

The fetch-watchdog fallback (pipeline/runner.py) must be able to finish a
run when the accelerator link is wedged — on machines where jax ships NO
CPU backend at all (the round-3 bench TPU exposed only the device plugin:
``jax.devices("cpu")`` raised and the rescue crashed, BENCH_r03.json).

Rather than maintaining a parallel numpy implementation of the kernel
chain (a divergence bug farm — the chain encodes dozens of reference
quirks, SURVEY.md §2 #8-11), this module re-executes the SAME source
files (ops/*.py, pipeline/device.py) in a namespace where ``jax`` /
``jax.numpy`` are numpy-backed shims:

  * ``jnp.*``      -> numpy (same API surface for everything the kernels
                      use; ``take`` gets jax's clip semantics, ``cumsum``
                      keeps jax's dtype behavior);
  * ``jax.lax``    -> python/numpy equivalents of scan / while_loop /
                      cummin / sort_key_val / dynamic_update_slice;
  * ``jax.jit``    -> identity decorator (keeps ``__wrapped__``);
  * pallas / stats modules -> inert fakes (the stats-free step never
                      calls them).

Bit-for-bit agreement with the jitted device step is pinned by
tests/test_host_step.py (random inputs across randomized configs).  The
only intentional deviations are value-preserving dtype widenings (numpy
promotes some int32 chains to int64; every row is cast back to the ring
dtype exactly like the device path does).
"""

import builtins
import importlib
import threading
import types

import numpy as np


# --------------------------------------------------------------------- jnp

class _JnpShim(types.ModuleType):
    """numpy with jax.numpy's divergent corners patched over."""

    def __init__(self):
        super().__init__("jax.numpy(npshim)")

    def __getattr__(self, name):
        return getattr(np, name)

    @staticmethod
    def take(a, indices, axis=None):
        # jax.numpy.take clamps out-of-bounds indices by default
        return np.take(a, indices, axis=axis, mode="clip")

    @staticmethod
    def cumsum(a, axis=None, dtype=None):
        # numpy upcasts sub-platform ints to int64; jax keeps the input
        # dtype (bool -> int32).  Match jax: identical wrap semantics.
        a = np.asarray(a)
        if dtype is None:
            dtype = np.int32 if a.dtype == np.bool_ else a.dtype
        return np.cumsum(a, axis=axis, dtype=dtype)


_jnp_shim = _JnpShim()


# --------------------------------------------------------------------- lax

def _tree_leaves(t):
    if t is None:
        return []
    if isinstance(t, (tuple, list)):
        out = []
        for x in t:
            out.extend(_tree_leaves(x))
        return out
    return [t]


def _tree_index(t, i):
    if isinstance(t, (tuple, list)):
        return type(t)(_tree_index(x, i) for x in t)
    return t[i]


def _tree_stack(items):
    """Stack a list of identically-structured step outputs along axis 0."""
    first = items[0]
    if isinstance(first, (tuple, list)):
        return type(first)(
            _tree_stack([it[k] for it in items]) for k in range(len(first)))
    return np.stack(items, axis=0)


class _LaxShim(types.ModuleType):
    def __init__(self):
        super().__init__("jax.lax(npshim)")

    @staticmethod
    def while_loop(cond, body, init):
        val = init
        while bool(cond(val)):
            val = body(val)
        return val

    @staticmethod
    def scan(f, init, xs, length=None):
        leaves = _tree_leaves(xs)
        n = length if length is not None else (
            leaves[0].shape[0] if leaves else 0)
        carry = init
        ys = None
        for i in range(n):
            carry, y = f(carry, _tree_index(xs, i) if xs is not None else None)
            if y is not None:
                if ys is None:
                    ys = []
                ys.append(y)
        return carry, (_tree_stack(ys) if ys else None)

    @staticmethod
    def cummin(a, axis=0):
        return np.minimum.accumulate(a, axis=axis)

    @staticmethod
    def sort_key_val(keys, values, dimension=-1, is_stable=True):
        order = np.argsort(keys, axis=dimension,
                           kind="stable" if is_stable else "quicksort")
        return (np.take_along_axis(keys, order, axis=dimension),
                np.take_along_axis(values, order, axis=dimension))

    @staticmethod
    def dynamic_update_slice(operand, update, start_indices):
        out = np.array(operand, copy=True)
        sl = []
        for s, osz, usz in zip(start_indices, operand.shape, update.shape):
            s = max(0, min(int(s), osz - usz))  # jax clamps starts
            sl.append(slice(s, s + usz))
        out[tuple(sl)] = update
        return out


# --------------------------------------------------------------------- jax

def _jit_shim(fun=None, **_kw):
    if fun is None:
        return lambda f: _jit_shim(f, **_kw)

    def wrapper(*a, **k):
        return fun(*a, **k)

    wrapper.__wrapped__ = fun
    return wrapper


class _ConfigShim:
    @staticmethod
    def update(*_a, **_k):
        pass


class _JaxShim(types.ModuleType):
    def __init__(self):
        super().__init__("jax(npshim)")
        self.numpy = _jnp_shim
        self.lax = _LaxShim()
        self.jit = staticmethod(_jit_shim)
        self.config = _ConfigShim()


_jax_shim = _JaxShim()


def _fail_stat_batch(*_a, **_k):
    raise RuntimeError("stats kernels are not available under npshim "
                       "(the host fallback runs the stats-free step)")


def _make_fake(name, attrs):
    m = types.ModuleType(name + "(npshim-fake)")
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


_FAKES = {
    "fastplong_tpu.ops.pallas_kernels": {
        "use_pallas": lambda: False,
        "mismatch_scan": lambda *a, **k: None,
    },
    "fastplong_tpu.ops.stats_kernels": {"stat_batch": _fail_stat_batch},
}

# modules re-executed under the shim (everything else imports for real)
_SHIM_EXACT = {"fastplong_tpu.pipeline.device"}
_SHIM_PREFIX = "fastplong_tpu.ops."

_cache = {}
_lock = threading.RLock()


def _resolve_name(name, globals_, level):
    if not level:
        return name
    pkg = globals_.get("__package__") or ""
    parts = pkg.split(".")
    if level > 1:
        parts = parts[:-(level - 1)]
    base = ".".join(parts)
    return base + ("." + name if name else "")


def _shim_import(name, globals_=None, locals_=None, fromlist=(), level=0):
    full = _resolve_name(name, globals_ or {}, level)
    if full == "jax" or full.startswith("jax."):
        if full == "jax.numpy":
            return _jnp_shim if fromlist else _jax_shim
        if full == "jax.lax":
            return _jax_shim.lax if fromlist else _jax_shim
        return _jax_shim
    if full in _FAKES:
        return load(full)
    if full in _SHIM_EXACT or full.startswith(_SHIM_PREFIX):
        return load(full)
    mod = builtins.__import__(name, globals_, locals_, fromlist, level)
    return mod


def load(fullname):
    """The numpy-backed instance of module `fullname` (cached)."""
    with _lock:
        if fullname in _cache:
            return _cache[fullname]
        if fullname in _FAKES:
            mod = _make_fake(fullname, _FAKES[fullname])
            _cache[fullname] = mod
            return mod
        real = importlib.import_module(fullname)
        path = real.__file__
        with open(path) as f:
            src = f.read()
        mod = types.ModuleType(fullname + "(npshim)")
        bi = dict(vars(builtins))
        bi["__import__"] = _shim_import
        mod.__dict__.update({
            "__file__": path,
            "__package__": fullname.rsplit(".", 1)[0],
            "__builtins__": bi,
        })
        # publish before exec: cyclic imports see the in-progress module
        _cache[fullname] = mod
        try:
            exec(compile(src, path, "exec"), mod.__dict__)
        except Exception:
            del _cache[fullname]
            raise
        return mod
