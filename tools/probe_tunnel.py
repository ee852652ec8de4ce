#!/usr/bin/env python
"""Characterize the axon tunnel: h2d/d2h bandwidth + dispatch latency,
before and after the first d2h, plus executable-load costs."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def t(f):
    t0 = time.perf_counter()
    r = f()
    jax.block_until_ready(r)
    return time.perf_counter() - t0, r


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    # trivial jit load cost (fresh shape)
    f = jax.jit(lambda x: x * 2 + 1)
    dt, _ = t(lambda: f(jnp.ones((128, 128), jnp.float32)))
    print("tiny jit first call: %.3fs" % dt)

    # h2d bandwidth (pre-d2h), 16MB
    x = np.random.randint(0, 255, size=(1 << 24,), dtype=np.uint8)
    dt, xd = t(lambda: jax.device_put(x))
    print("h2d 16MB pre-d2h: %.3fs = %.1f MB/s" % (dt, 16 / dt))
    dt, xd2 = t(lambda: jax.device_put(x))
    print("h2d 16MB pre-d2h #2: %.3fs = %.1f MB/s" % (dt, 16 / dt))

    # dispatch latency pre-d2h (cached executable)
    g = jax.jit(lambda a: a.sum())
    _ = jax.block_until_ready(g(xd))
    ts = []
    for _i in range(5):
        dt, _ = t(lambda: g(xd))
        ts.append(dt)
    print("tiny dispatch pre-d2h: %s" % ["%.4f" % v for v in ts])

    # FIRST d2h: 1MB
    y = jax.device_put(np.zeros(1 << 20, np.uint8))
    jax.block_until_ready(y)
    dt0 = time.perf_counter()
    np.asarray(y)
    dt = time.perf_counter() - dt0
    print("FIRST d2h 1MB: %.3fs = %.2f MB/s" % (dt, 1 / dt))

    # d2h again
    y2 = jax.device_put(np.ones(1 << 20, np.uint8))
    jax.block_until_ready(y2)
    dt0 = time.perf_counter()
    np.asarray(y2)
    dt = time.perf_counter() - dt0
    print("d2h 1MB #2: %.3fs = %.2f MB/s" % (dt, 1 / dt))

    # tiny d2h (RTT floor)
    z = jax.device_put(np.ones(64, np.uint8))
    jax.block_until_ready(z)
    dt0 = time.perf_counter()
    np.asarray(z)
    dt = time.perf_counter() - dt0
    print("d2h 64B: %.3fs" % dt)

    # h2d bandwidth post-d2h
    dt, _ = t(lambda: jax.device_put(x))
    print("h2d 16MB post-d2h: %.3fs = %.1f MB/s" % (dt, 16 / dt))

    # dispatch latency post-d2h
    ts = []
    for _i in range(5):
        dt, _ = t(lambda: g(xd))
        ts.append(dt)
    print("tiny dispatch post-d2h: %s" % ["%.4f" % v for v in ts])

    # async pipelining: do 8 h2d+dispatch WITHOUT blocking, then block once
    t0 = time.perf_counter()
    outs = []
    for _i in range(8):
        xi = jax.device_put(x)
        outs.append(g(xi))
    mid = time.perf_counter() - t0
    jax.block_until_ready(outs)
    total = time.perf_counter() - t0
    print("8x (h2d16MB+dispatch) async: enqueue %.3fs, complete %.3fs "
          "= %.1f MB/s" % (mid, total, 8 * 16 / total))


if __name__ == "__main__":
    main()
