"""Benchmarks: one JSON line per metric on stdout.

Metrics (BASELINE.md):
  extract_kmer_scan_reads_per_sec  - device repeat-scan kernel, reads/s/chip
  extract_e2e_reads_per_sec        - full native-engine->device->treads stage
  call_loci_per_sec                - loci genotyped per second (call stage)

Baseline context: the reference prints reads/s at runtime but publishes no
number; a single Nim thread on production hardware runs the extract scan at
roughly 70k reads/s (8GB/4h slurm budget for a ~1e9-read 30x WGS BAM,
pipelines/bpipe.config:13-15). vs_baseline uses that 70k estimate for both
extract metrics. For call, the reference genotypes a few loci/s (per-locus
random-access BAM window queries, collect.nim:130-182); vs_baseline uses a
10 loci/s estimate.

`--smoke` runs tiny sizes on whatever backend is active (used by
scripts/check.sh as a does-it-run gate, not a measurement).
"""

import json
import os
import sys
import time

import numpy as np

NIM_BASELINE_READS_PER_SEC = 70_000.0
NIM_BASELINE_LOCI_PER_SEC = 10.0
CACHE_DIR = os.path.expanduser("~/.cache/strling_bench")


def emit(metric, value, unit, vs):
    print(json.dumps({
        "metric": metric, "value": round(value, 1), "unit": unit,
        "vs_baseline": round(vs, 2),
    }), flush=True)


def bench_kernel(smoke: bool):
    import jax
    from strling_tpu.ops.kmer import _host_thresholds, get_repeat_device

    B, L = (4096, 152) if smoke else (32768, 152)
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
    args = [jax.device_put(x, dev) for x in (bases_np, lengths_np, te, tp)]

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
    out = fn(*args)
    np.asarray(out[2])

    def run(iters: int) -> float:
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        np.asarray(outs[-1][2])
        return time.perf_counter() - t0

    run(2)  # warm
    n1, n2 = (2, 6) if smoke else (5, 25)
    reps = 1 if smoke else 3
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    per_batch = max(1e-9, (t2 - t1) / (n2 - n1))
    rps = B / per_batch
    emit("extract_kmer_scan_reads_per_sec", rps, "reads/s/chip",
         rps / NIM_BASELINE_READS_PER_SEC)
    print(f"# kernel device={dev.platform} B={B} L={L} "
          f"per_batch={per_batch*1e3:.2f}ms", file=sys.stderr)


def _bench_bam(n_pairs: int, seed: int = 7) -> str:
    """Synthetic WGS-like BAM for the e2e stage bench (cached on disk):
    150bp proper pairs, ~5% STR-read pairs, the rest random sequence."""
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"bench_{n_pairs}.bam")
    if os.path.exists(path) and os.path.exists(path + ".bai"):
        return path
    from strling_tpu.io.bamwrite import BamRecord, write_bam

    rng = np.random.default_rng(seed)
    L, G = 150, 50_000_000
    alphabet = np.array(list("ACGT"))
    units = ["CAG", "A", "AT", "AAGGG", "ATTCT"]
    recs = []
    pos = np.sort(rng.integers(0, G - 2000, n_pairs))
    isizes = rng.integers(300, 500, n_pairs)
    seqs = alphabet[rng.integers(0, 4, (n_pairs, 2, L))]
    for i in range(n_pairs):
        p = int(pos[i])
        isz = int(isizes[i])
        s1 = "".join(seqs[i, 0])
        s2 = "".join(seqs[i, 1])
        if i % 20 == 0:
            u = units[i % len(units)]
            s2 = (u * (L // len(u) + 1))[:L]
        q = f"r{i}"
        mq = 60
        recs.append(BamRecord(q, 0x63, 0, p, mq, [(L, 0)], 0, p + isz - L,
                              isz, s1))
        recs.append(BamRecord(q, 0x93, 0, p + isz - L, mq, [(L, 0)], 0, p,
                              -isz, s2))
    recs.sort(key=lambda r: r.pos)
    hdr = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chrB\tLN:%d\n" % G
    write_bam(path, hdr, [("chrB", G)], recs)
    return path


def bench_extract_e2e(smoke: bool):
    from strling_tpu.core.extract import extract_native
    from strling_tpu.io.bam import Bam

    n_pairs = 5_000 if smoke else 250_000
    path = _bench_bam(n_pairs)
    best = 0.0
    for _ in range(1 if smoke else 3):
        bam = Bam(path)
        t0 = time.perf_counter()
        tb, frag, opts = extract_native(bam, None, None)
        dt = time.perf_counter() - t0
        nreads = 2 * n_pairs
        best = max(best, nreads / dt)
    emit("extract_e2e_reads_per_sec", best, "reads/s",
         best / NIM_BASELINE_READS_PER_SEC)
    print(f"# e2e n_reads={2*n_pairs} treads={len(tb)}", file=sys.stderr)


def bench_call(smoke: bool):
    import tempfile

    from strling_tpu.core.call import run_call
    from strling_tpu.core.extract import extract
    from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam
    from strling_tpu.io.bam import Bam
    from strling_tpu.io.binfmt import write_bin
    from strling_tpu.io.fasta import write_fasta

    n_loci = 4 if smoke else 32
    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(5)
        gap = 25_000
        G = gap * (n_loci + 2)
        seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, G)])
        alleles = []
        parts, cur = [], 0
        for i in range(n_loci):
            p = gap * (i + 1)
            parts.append(seq[cur:p])
            parts.append("CAG" * 10)
            cur = p
            alleles.append(Allele("chr1", p, (0, 60), "CAG"))
        parts.append(seq[cur:])
        write_fasta(os.path.join(d, "ref.fa"), {"chr1": "".join(parts)})
        # account for the inserted reference repeats when placing alleles
        for i, a in enumerate(alleles):
            alleles[i] = Allele("chr1", a.position + 30 * i, a.counts,
                                a.repeat_unit)
        hist = normal_hist(400, 50)
        bam_path = os.path.join(d, "s.bam")
        # flank must exceed the simulator's 2*4096 sampling margin
        # (simulate_allele: L = len(hap) - 2*4096) or zero reads come out
        simulate_str_bam(os.path.join(d, "ref.fa"), alleles, bam_path, hist,
                         depth=30, flank=11_000, seed=1)
        bam = Bam(bam_path)
        tb, frag, opts = extract(bam, None, None)
        binp = os.path.join(d, "s.bin")
        write_bin(binp, tb, frag, bam.header_text, 0.8, 40)
        dt = float("inf")  # best-of-3: the ~0.3s measurement is noisy on a
        for _ in range(1 if smoke else 3):  # shared 2-core host
            t0 = time.perf_counter()
            run_call(bam_path, binp, output_prefix=os.path.join(d, "out"))
            dt = min(dt, time.perf_counter() - t0)
        lines = open(os.path.join(d, "out-genotype.txt")).read().splitlines()
        n_called = len(lines) - 1
        if n_called < n_loci // 2:
            print(f"# WARNING: call bench genotyped {n_called}/{n_loci} "
                  "planted loci — metric unreliable", file=sys.stderr)
        lps = n_called / dt
    emit("call_loci_per_sec", lps, "loci/s", lps / NIM_BASELINE_LOCI_PER_SEC)
    print(f"# call n_called={n_called} dt={dt:.2f}s", file=sys.stderr)


def main():
    smoke = "--smoke" in sys.argv
    import jax

    if smoke and "--tpu" not in sys.argv:
        # deterministic, tunnel-free gate run (sitecustomize pins the axon
        # platform, so the flip must happen in-process)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    bench_kernel(smoke)
    for fn in (bench_extract_e2e, bench_call):
        try:
            fn(smoke)
        except Exception as e:  # secondary metrics must not mask the primary
            print(f"# {fn.__name__} failed: {e!r}", file=sys.stderr)
            if smoke:
                raise


if __name__ == "__main__":
    main()
