"""Distributed merge: locus-space sharding over the device mesh.

Single-process runs span the 8 virtual CPU devices (conftest); the
multi-process test spawns two jax.distributed workers (Gloo collectives) and
checks the written bounds file. Both must reproduce single-process
run_merge's lines byte-identically INCLUDING order — both paths pin the
canonical order (bed loci in bed order, then clusters sorted by
(tid, left, repeat))."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from strling_tpu.core.merge import run_merge
from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam
from strling_tpu.core.tread import TREAD_DTYPE
from strling_tpu.io.bam import Bam
from strling_tpu.io.binfmt import read_bin, write_bin
from strling_tpu.io.fasta import write_fasta
from strling_tpu.parallel.merge_dist import pack_treads, run_merge_dist, unpack_treads

LOCUS1 = 20000
LOCUS2 = 5000


@pytest.fixture(scope="module")
def bins_dir(tmp_path_factory):
    from strling_tpu.core.extract import extract

    d = tmp_path_factory.mktemp("mdist")
    rng = np.random.default_rng(5)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 40000)])
    seq = seq[:LOCUS1] + "CAG" * 10 + seq[LOCUS1:]
    seq2 = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 20000)])
    seq2 = seq2[:LOCUS2] + "AT" * 12 + seq2[LOCUS2:]
    write_fasta(str(d / "ref.fa"), {"chr1": seq, "chr2": seq2})
    hist = normal_hist(400, 50)
    cfgs = [
        ("s1", [Allele("chr1", LOCUS1, (0, 120), "CAG")], 1),
        ("s2", [Allele("chr2", LOCUS2, (0, 150), "AT")], 2),
        ("s3", [Allele("chr1", LOCUS1, (0, 110), "CAG"),
                Allele("chr2", LOCUS2, (0, 90), "AT")], 3),
    ]
    bins = []
    for sample, alleles, seed in cfgs:
        bam_p = str(d / f"{sample}.bam")
        simulate_str_bam(str(d / "ref.fa"), alleles, bam_p, hist, depth=30,
                         flank=6000, seed=seed)
        bam = Bam(bam_p)
        treads, frag_dist, _ = extract(bam, None, None)
        binp = str(d / f"{sample}.bin")
        write_bin(binp, treads, frag_dist, bam.header_text, 0.8, 40)
        bins.append(binp)
    return d, bins


def _read_lines(path):
    with open(path) as f:
        lines = f.read().splitlines()
    return lines[0], lines[1:]  # exact order — canonical in both paths


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    n = 500
    data = np.zeros(n, TREAD_DTYPE)
    data["tid"] = rng.integers(-1, 30, n)
    data["position"] = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    units = np.array([b"", b"A", b"AT", b"CAG", b"AAGGG", b"ATTCTG"], dtype="S6")
    data["repeat"] = units[rng.integers(0, len(units), n)]
    data["flag"] = rng.integers(0, 2**16, n)
    data["split"] = rng.integers(0, 6, n)
    data["mapping_quality"] = rng.integers(0, 256, n)
    data["repeat_count"] = rng.integers(0, 256, n)
    data["align_length"] = rng.integers(0, 256, n)
    data["sample"] = rng.integers(0, 1000, n)
    back = unpack_treads(pack_treads(data))
    assert np.array_equal(back, data)


def test_single_process_matches_run_merge(bins_dir):
    d, bins = bins_dir
    run_merge(bins, output_prefix=str(d / "ref_merge"))
    lines = run_merge_dist(bins, output_prefix=str(d / "dist_merge"))
    h1, want = _read_lines(str(d / "ref_merge-bounds.txt"))
    h2, got = _read_lines(str(d / "dist_merge-bounds.txt"))
    assert h1 == h2
    assert got == want
    assert lines == want
    assert len(want) >= 2  # both planted loci discovered


def test_single_process_with_bed(bins_dir):
    d, bins = bins_dir
    bed = str(d / "loci.bed")
    with open(bed, "w") as f:
        f.write(f"chr1\t{LOCUS1}\t{LOCUS1 + 30}\tCAG\tHTT_like\n")
    run_merge(bins, bed=bed, output_prefix=str(d / "ref_bed"))
    run_merge_dist(bins, bed=bed, output_prefix=str(d / "dist_bed"))
    _, want = _read_lines(str(d / "ref_bed-bounds.txt"))
    _, got = _read_lines(str(d / "dist_bed-bounds.txt"))
    assert got == want
    assert any("HTT_like" in l for l in got)


WORKER = textwrap.dedent("""
    import os, sys
    pid, n, port, out_prefix = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
    bins = sys.argv[5:]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=int(n), process_id=int(pid))
    from strling_tpu.parallel.merge_dist import run_merge_dist
    run_merge_dist(bins, output_prefix=out_prefix)
""")


def test_multi_process_matches_run_merge(bins_dir, tmp_path):
    d, bins = bins_dir
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_prefix = str(tmp_path / "mp_merge")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", "12643", out_prefix] + bins,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]
    run_merge(bins, output_prefix=str(d / "ref_merge2"))
    _, want = _read_lines(str(d / "ref_merge2-bounds.txt"))
    _, got = _read_lines(out_prefix + "-bounds.txt")
    assert got == want


def test_skewed_cohort_chunked_exchange(tmp_path):
    """Adversarial skew: every tread is the same (tid, unit), so the whole
    cohort routes to ONE shard. The chunked exchange must stay within its
    per-round budget (memory O(S^2 * C_ROUND), not O(S^2 * cmax)) and still
    produce bounds byte-identical to single-process run_merge."""
    import strling_tpu.parallel.merge_dist as MD
    from strling_tpu.core.tread import Soft, TreadBatch
    from strling_tpu.io.binfmt import write_bin

    rng = np.random.default_rng(8)
    header = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:1000000\n"
    n_per = 4000
    bins = []
    hist = np.zeros(4096, np.uint32)
    hist[400] = 1000
    for smp in range(4):
        data = np.zeros(n_per, TREAD_DTYPE)
        data["tid"] = 0
        base = 500_000
        data["position"] = np.sort(rng.integers(base, base + 50, n_per)).astype(np.uint32)
        data["repeat"] = b"CAG"
        data["flag"] = 0
        data["split"] = int(Soft.none)
        data["mapping_quality"] = 60
        data["repeat_count"] = 30
        data["align_length"] = 150
        tb = TreadBatch(data=data, qnames=[f"s{smp}r{i}" for i in range(n_per)])
        p = str(tmp_path / f"skew{smp}.bin")
        write_bin(p, tb, hist, header, 0.8, 40)
        bins.append(p)
    # force many rounds: shrink the per-round budget so cmax >> C
    old = MD.EXCHANGE_BUDGET_BYTES
    MD.EXCHANGE_BUDGET_BYTES = 64 << 10  # 64KB -> C of a few hundred rows
    try:
        lines = run_merge_dist(bins, output_prefix=str(tmp_path / "dist"))
    finally:
        MD.EXCHANGE_BUDGET_BYTES = old
    run_merge(bins, output_prefix=str(tmp_path / "ref"))
    _, want = _read_lines(str(tmp_path / "ref-bounds.txt"))
    _, got = _read_lines(str(tmp_path / "dist-bounds.txt"))
    assert got == want and lines == want
    assert len(want) >= 1
