"""Measure the axon tunnel's transfer characteristics: round-trip latency,
host->device and device->host bandwidth, and whether transfers from multiple
threads overlap. Informs the extract dispatch design (batch size / pipeline
depth / payload layout)."""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)

    @jax.jit
    def bump(x):
        return x + 1

    # warm up
    small = np.zeros(64, np.uint8)
    np.asarray(bump(jax.device_put(small, dev)))

    def rt(nbytes, iters=8):
        x = np.random.randint(0, 255, nbytes, dtype=np.uint8)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            y = jax.device_put(x, dev)
            _ = np.asarray(bump(y))[:1]
            ts.append(time.perf_counter() - t0)
        return min(ts), sorted(ts)[len(ts) // 2]

    for size in (64, 64 * 1024, 1 << 20, 2 << 20, 4 << 20, 8 << 20):
        mn, md = rt(size)
        print(f"h2d+call+fetch {size/1e6:7.3f}MB  min {mn*1e3:7.1f}ms  "
              f"median {md*1e3:7.1f}ms")

    # pure fetch cost: device-resident array of n bytes fetched to host
    for size in (64, 1 << 20, 4 << 20):
        x = jax.device_put(np.zeros(size, np.uint8), dev)
        np.asarray(bump(x))
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            np.asarray(x)
            ts.append(time.perf_counter() - t0)
        print(f"d2h        {size/1e6:7.3f}MB  min {min(ts)*1e3:7.1f}ms")

    # concurrency: N threads each doing put+call+fetch of 2MB
    x = np.random.randint(0, 255, 2 << 20, dtype=np.uint8)

    def job(_):
        y = jax.device_put(x, dev)
        return np.asarray(bump(y))[0]

    for nthreads in (1, 2, 4, 8):
        with ThreadPoolExecutor(max_workers=nthreads) as pool:
            t0 = time.perf_counter()
            list(pool.map(job, range(nthreads * 3)))
            dt = time.perf_counter() - t0
        per = dt / (nthreads * 3)
        print(f"concurrent x{nthreads}: {per*1e3:6.1f}ms per 2MB op "
              f"({nthreads*3} ops in {dt*1e3:.0f}ms)")


if __name__ == "__main__":
    main()
