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

    fn = jax.jit(get_repeat_device)
    # warmup/compile. NOTE: on the tunneled axon platform block_until_ready
    # does not actually wait, so all timing syncs go through a host fetch.
    out = fn(bases, lengths, te_d, tp_d)
    np.asarray(out[2])

    iters = 20
    t0 = time.perf_counter()
    outs = [fn(bases, lengths, te_d, tp_d) for _ in range(iters)]
    for o in outs:
        np.asarray(o[2])  # sync every dispatch
    dt = time.perf_counter() - t0

    reads_per_sec = B * iters / dt
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
        f"# device={dev.platform} B={B} L={L} iters={iters} wall={dt:.3f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
