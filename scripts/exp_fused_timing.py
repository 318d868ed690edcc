"""Times the PRODUCTION fused dispatch (_pallas_fused_jit on the n8
payload) — the exact program bench.py's kernel metric records — using the
same pipelined dispatch-chain slope. Experiment tool for kernel work.

Usage: python scripts/exp_fused_timing.py [reps rounds]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from strling_tpu.ops.kmer import fuse_payload  # noqa: E402
from strling_tpu.ops.kmer_pallas import _pallas_fused_jit  # noqa: E402


@partial(jax.jit, static_argnums=(1,))
def _chained(payload, layout, token):
    """Production kernel body + a token that serializes chained dispatches
    (independent programs can be overlapped/reordered by the remote
    service, which collapses chain slopes — see bench.bench_kernel)."""
    out = _pallas_fused_jit.__wrapped__(payload, layout)
    return out, token + out[0]


def main():
    B, L = 32768, 152
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    bases_np = alphabet[rng.integers(0, 4, (B, L))]
    units = [b"CAG", b"A", b"AT", b"AAGGG", b"ATTCT"]
    for i in range(0, B, 10):
        u = units[i % len(units)]
        bases_np[i] = np.frombuffer((u * (L // len(u) + 1))[:L], np.uint8)
    lengths_np = np.full(B, L, np.int32)
    payload, layout = fuse_payload(bases_np, lengths_np, np.full(B, 0.8),
                                   return_layout=True)
    dev = jax.devices()[0]
    arr = jax.device_put(payload, dev)
    tok0 = jax.device_put(jnp.zeros((), jnp.int32), dev)
    t0 = time.perf_counter()
    np.asarray(_chained(arr, layout, tok0)[1])
    print(f"# compile+first: {time.perf_counter()-t0:.1f}s", flush=True)

    def run(iters):
        t0 = time.perf_counter()
        token = tok0
        for _ in range(iters):
            _, token = _chained(arr, layout, token)
        np.asarray(token)
        return time.perf_counter() - t0

    run(2)
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    best = float("inf")
    for r in range(rounds):
        if r:
            time.sleep(10)
        t1 = min(run(5) for _ in range(reps))
        t2 = min(run(25) for _ in range(reps))
        pb = max(1e-9, (t2 - t1) / 20)
        print(f"round {r}: {pb*1e3:.3f} ms/batch  {B/pb/1e6:.1f} M reads/s",
              flush=True)
        best = min(best, pb)
    print(f"best: {best*1e3:.3f} ms/batch  {B/best/1e6:.1f} M reads/s")


if __name__ == "__main__":
    main()
