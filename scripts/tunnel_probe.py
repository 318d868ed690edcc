"""Measure the axon tunnel's transfer characteristics: round-trip latency,
h2d+d2h bandwidth, and whether transfers from multiple threads overlap.
jit-free (device_put + host fetch only) so no remote compiles are involved.
Informs the extract dispatch design (batch size / pipeline depth / layout)."""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    import jax

    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    big = np.random.randint(0, 255, 16 << 20, dtype=np.uint8)
    np.asarray(jax.device_put(big[:64], dev))  # warm

    def rt(size, iters=8):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            y = jax.device_put(big[:size], dev)
            np.asarray(y)
            ts.append(time.perf_counter() - t0)
        return min(ts), sorted(ts)[len(ts) // 2]

    print("put+fetch (h2d + d2h of same size):")
    for size in (64, 64 << 10, 1 << 20, 2 << 20, 4 << 20, 8 << 20):
        mn, md = rt(size)
        print(f"  {size/1e6:7.3f}MB  min {mn*1e3:7.1f}ms  median {md*1e3:7.1f}ms")

    def job(size):
        y = jax.device_put(big[:size], dev)
        return np.asarray(y)[0]

    print("concurrent put+fetch of 2MB from N threads:")
    for nthreads in (1, 2, 4, 8):
        with ThreadPoolExecutor(max_workers=nthreads) as pool:
            t0 = time.perf_counter()
            list(pool.map(job, [2 << 20] * (nthreads * 3)))
            dt = time.perf_counter() - t0
        print(f"  x{nthreads}: {dt/(nthreads*3)*1e3:6.1f}ms/op "
              f"({nthreads*3} ops in {dt*1e3:.0f}ms)")


if __name__ == "__main__":
    main()
