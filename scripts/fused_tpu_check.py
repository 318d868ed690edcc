"""Real-hardware check + timing of the PRODUCTION fused dispatch
(_pallas_fused_jit) on an n8 payload: expected results come from the XLA
fused path computed on CPU in a subprocess (independent of the Pallas
kernel), then the TPU run must match exactly. Also times the fused path
per batch (the bench.py kernel metric's shape)."""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B, L = 32768, 152


def build_payload():
    from strling_tpu.ops.kmer import fuse_payload

    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    bases = alphabet[rng.integers(0, 4, (B, L))]
    units = [b"CAG", b"A", b"AT", b"AAGGG", b"ATTCT"]
    for i in range(0, B, 10):
        u = units[i % len(units)]
        bases[i] = np.frombuffer((u * (L // len(u) + 1))[:L], np.uint8)
    lengths = np.full(B, L, np.int32)
    lengths[::17] = rng.integers(8, L, (B + 16) // 17)
    for i in range(B):
        bases[i, lengths[i]:] = 0
    payload, layout = fuse_payload(bases, lengths, np.full(B, 0.8),
                                   return_layout=True)
    assert layout == "n8", layout
    return payload


def child():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from strling_tpu.ops.kmer import _fused_xla_jit

    payload = build_payload()
    out = np.asarray(_fused_xla_jit(jax.numpy.asarray(payload), "n8"))
    np.save("/tmp/fused_check_expected.npy", out)
    print("expected written")


def main():
    if "--child" in sys.argv:
        child()
        return
    subprocess.run([sys.executable, os.path.abspath(__file__), "--child"],
                   check=True, env=dict(os.environ, JAX_PLATFORMS="cpu"))
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from strling_tpu.ops.kmer_pallas import _pallas_fused_jit

    payload = build_payload()
    want = np.load("/tmp/fused_check_expected.npy")
    arr = jax.device_put(payload, jax.devices()[0])
    t0 = time.perf_counter()
    got = np.asarray(_pallas_fused_jit(arr, "n8"))
    print(f"first call (compile) {time.perf_counter()-t0:.1f}s")
    mism = int((got != want).sum())
    print(f"mismatches: {mism} / {B}")
    assert mism == 0

    def run(iters):
        t0 = time.perf_counter()
        outs = [_pallas_fused_jit(arr, "n8") for _ in range(iters)]
        np.asarray(outs[-1])
        return time.perf_counter() - t0

    run(3)
    t1 = min(run(5) for _ in range(3))
    t2 = min(run(25) for _ in range(3))
    per = max(1e-9, (t2 - t1) / 20)
    print(f"fused n8: per_batch={per*1e3:.2f}ms  {B/per/1e6:.1f}M reads/s")


if __name__ == "__main__":
    main()
