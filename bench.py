"""Benchmark: reads/s of the extract repeat-scan kernel on the current device.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context (BASELINE.md): the reference prints reads/s at runtime but
publishes no number; a single Nim thread on production hardware runs the
extract scan at roughly 70k reads/s (8GB/4h slurm budget for a ~1e9-read 30x
WGS BAM, pipelines/bpipe.config:13-15). vs_baseline uses that 70k estimate.
"""

import json
import sys
import time

import numpy as np

NIM_BASELINE_READS_PER_SEC = 70_000.0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from strling_tpu.ops.kmer import _host_thresholds, get_repeat_device

    B, L = 32768, 152
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    bases_np = alphabet[rng.integers(0, 4, (B, L))]
    # realistic mix: ~10% of scanned reads are STR-like
    units = [b"CAG", b"A", b"AT", b"AAGGG", b"ATTCT"]
    for i in range(0, B, 10):
        u = units[i % len(units)]
        bases_np[i] = np.frombuffer((u * (L // len(u) + 1))[:L], np.uint8)
    lengths_np = np.full(B, L, np.int32)
    te, tp = _host_thresholds(lengths_np, np.full(B, 0.8))

    dev = jax.devices()[0]
    bases = jax.device_put(bases_np, dev)
    lengths = jax.device_put(lengths_np, dev)
    te_d = jax.device_put(te, dev)
    tp_d = jax.device_put(tp, dev)

    if jax.default_backend() == "cpu":
        fn = jax.jit(get_repeat_device)
    else:
        from strling_tpu.ops.kmer_pallas import get_repeat_device_pallas

        fn = jax.jit(get_repeat_device_pallas)
    # warmup/compile. NOTE: on the tunneled axon platform block_until_ready
    # does not actually wait, so all timing syncs go through a host fetch,
    # and each fetch costs a fixed ~30ms tunnel round trip. Per-batch device
    # time is therefore measured as the slope between a short and a long
    # pipelined dispatch chain (the fixed latency cancels).
    out = fn(bases, lengths, te_d, tp_d)
    np.asarray(out[2])

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        outs = [fn(bases, lengths, te_d, tp_d) for _ in range(iters)]
        np.asarray(outs[-1][2])
        return time.perf_counter() - t0

    run(2)  # warm
    n1, n2 = 5, 25
    t1 = min(run(n1) for _ in range(3))
    t2 = min(run(n2) for _ in range(3))
    per_batch = max(1e-9, (t2 - t1) / (n2 - n1))
    reads_per_sec = B / per_batch
    print(
        json.dumps(
            {
                "metric": "extract_kmer_scan_reads_per_sec",
                "value": round(reads_per_sec, 1),
                "unit": "reads/s/chip",
                "vs_baseline": round(reads_per_sec / NIM_BASELINE_READS_PER_SEC, 2),
            }
        )
    )
    print(
        f"# device={dev.platform} B={B} L={L} per_batch={per_batch*1e3:.2f}ms",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
