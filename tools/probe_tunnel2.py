#!/usr/bin/env python
"""Probe 2: first-d2h size dependence, concurrent executable loads,
d2h concurrency with h2d/dispatch."""
import sys
import time
import threading

import numpy as np
import jax
import jax.numpy as jnp


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "tiny_first_d2h"
    if mode == "tiny_first_d2h":
        # fresh process: is the first-d2h penalty size-dependent?
        z = jax.device_put(np.ones(64, np.uint8))
        jax.block_until_ready(z)
        t0 = time.perf_counter()
        np.asarray(z)
        print("FIRST d2h 64B: %.3fs" % (time.perf_counter() - t0))
        y = jax.device_put(np.zeros(1 << 20, np.uint8))
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        np.asarray(y)
        print("second d2h 1MB: %.3fs" % (time.perf_counter() - t0))
    elif mode == "conc_loads":
        # load 4 distinct executables from 4 threads concurrently
        def make(i):
            L = 1024 * (2 ** i)
            f = jax.jit(lambda x: (x[:, :L // 2].astype(jnp.int32) * 3
                                   ).cumsum(axis=1).sum())
            x = np.ones((64, L), np.uint8)
            return f, x
        fs = [make(i) for i in range(4)]
        t0 = time.perf_counter()
        threads = []
        times = {}

        def run(i):
            f, x = fs[i]
            ti = time.perf_counter()
            jax.block_until_ready(f(x))
            times[i] = time.perf_counter() - ti
        for i in range(4):
            th = threading.Thread(target=run, args=(i,))
            th.start()
            threads.append(th)
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0
        print("concurrent loads: wall %.3fs, each %s" % (
            wall, ["%.2f" % times[i] for i in range(4)]))
    elif mode == "serial_loads":
        def make(i):
            L = 1024 * (2 ** i)
            f = jax.jit(lambda x: (x[:, :L // 2].astype(jnp.int32) * 3
                                   ).cumsum(axis=1).sum())
            x = np.ones((64, L), np.uint8)
            return f, x
        fs = [make(i) for i in range(4)]
        t0 = time.perf_counter()
        for f, x in fs:
            jax.block_until_ready(f(x))
        print("serial loads: wall %.3fs" % (time.perf_counter() - t0))
    elif mode == "d2h_background":
        # does a background-thread d2h block main-thread h2d+dispatch?
        g = jax.jit(lambda a: a.sum())
        x = np.random.randint(0, 255, size=(1 << 24,), dtype=np.uint8)
        xd = jax.device_put(x)
        jax.block_until_ready(g(xd))
        y = jax.device_put(np.zeros(1 << 20, np.uint8))
        jax.block_until_ready(y)
        done = {}

        def fetch():
            t0 = time.perf_counter()
            np.asarray(y)  # FIRST d2h of the process, in background
            done["d2h"] = time.perf_counter() - t0
        th = threading.Thread(target=fetch)
        t0 = time.perf_counter()
        th.start()
        time.sleep(0.05)
        laps = []
        for _ in range(6):
            t1 = time.perf_counter()
            jax.block_until_ready(g(jax.device_put(x)))
            laps.append(time.perf_counter() - t1)
        th.join()
        print("background first-d2h: %.3fs; concurrent h2d16MB+dispatch "
              "laps: %s" % (done["d2h"], ["%.3f" % v for v in laps]))


if __name__ == "__main__":
    main()
