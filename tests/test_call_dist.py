"""Distributed call: locus-space sharding with mesh-collective barriers.

Single-process runs span the 8 virtual CPU devices (conftest); the
multi-process test spawns two jax.distributed workers (Gloo) and checks the
written files. All paths must reproduce single-process run_call's
-genotype.txt / -bounds.txt / -unplaced.txt byte-identically, including
line order (the distributed path replays the order-dependent locus
bookkeeping and re-assembles calls by a global order key)."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from strling_tpu.core.call import add_percentile, oe_ratio, run_call
from strling_tpu.core.genotyper import Call
from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam
from strling_tpu.io.bam import Bam
from strling_tpu.io.binfmt import write_bin
from strling_tpu.io.fasta import write_fasta
from strling_tpu.parallel.call_dist import rank_oes_on_mesh, run_call_dist

LOCUS1 = 20000
LOCUS2 = 5000


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    from strling_tpu.core.extract import extract

    d = tmp_path_factory.mktemp("cdist")
    rng = np.random.default_rng(9)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 40000)])
    seq = seq[:LOCUS1] + "CAG" * 10 + seq[LOCUS1:]
    seq2 = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 20000)])
    seq2 = seq2[:LOCUS2] + "AT" * 12 + seq2[LOCUS2:]
    write_fasta(str(d / "ref.fa"), {"chr1": seq, "chr2": seq2})
    hist = normal_hist(400, 50)
    bam_p = str(d / "s.bam")
    simulate_str_bam(
        str(d / "ref.fa"),
        [Allele("chr1", LOCUS1, (0, 120), "CAG"),
         Allele("chr2", LOCUS2, (0, 150), "AT")],
        bam_p, hist, depth=30, flank=6000, seed=4,
    )
    bam = Bam(bam_p)
    treads, frag_dist, _ = extract(bam, None, None)
    binp = str(d / "s.bin")
    write_bin(binp, treads, frag_dist, bam.header_text, 0.8, 40)
    return d, bam_p, binp


def _files(prefix):
    out = {}
    for suffix in ("-genotype.txt", "-bounds.txt", "-unplaced.txt"):
        with open(prefix + suffix) as f:
            out[suffix] = f.read()
    return out


def test_rank_oes_matches_add_percentile():
    """The mesh collective must reproduce add_percentile's f32 math on
    ragged per-shard lists (call.nim:38-47)."""
    import jax
    from jax.sharding import Mesh

    rng = np.random.default_rng(3)
    mesh = Mesh(np.array(jax.devices()), ("d",))
    S = len(jax.devices())
    calls = []
    shards = [[] for _ in range(S)]
    for i in range(23):
        c = Call()
        c.spanning_pairs = int(rng.integers(0, 40))
        c.expected_spanning_fragments = float(rng.uniform(0.0, 50.0))
        calls.append(c)
        shards[i % S].append(c)
    add_percentile({"X": calls})
    want = [c.spanning_fragments_oe_percentile for c in calls]
    oes_by_shard = [np.array([oe_ratio(c) for c in sl], np.float32)
                    for sl in shards]
    pct = rank_oes_on_mesh(oes_by_shard, mesh)
    got_by_call = {}
    for s, sl in enumerate(shards):
        for r, c in enumerate(sl):
            got_by_call[id(c)] = pct[s][r]
    got = [got_by_call[id(c)] for c in calls]
    np.testing.assert_array_equal(np.array(want, np.float32),
                                  np.array(got, np.float32))


def test_rank_oes_single_call_nan():
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("d",))
    S = len(jax.devices())
    shards = [np.zeros(0, np.float32) for _ in range(S)]
    shards[0] = np.array([1.5], np.float32)
    pct = rank_oes_on_mesh(shards, mesh)
    assert np.isnan(pct[0][0])  # len==1 gives 0/0 == nan (call.nim:30)


def test_single_process_matches_run_call(sample):
    d, bam_p, binp = sample
    run_call(bam_p, binp, output_prefix=str(d / "ref_call"))
    lines = run_call_dist(bam_p, binp, output_prefix=str(d / "dist_call"))
    want = _files(str(d / "ref_call"))
    got = _files(str(d / "dist_call"))
    assert got == want
    assert lines == want["-genotype.txt"].splitlines()[1:]
    assert len(lines) >= 2  # both planted loci genotyped


def test_single_process_with_loci(sample, tmp_path):
    d, bam_p, binp = sample
    bed = str(tmp_path / "loci.bed")
    with open(bed, "w") as f:
        f.write(f"chr1\t{LOCUS1}\t{LOCUS1 + 30}\tCAG\tHTT_like\n")
    run_call(bam_p, binp, loci=bed, output_prefix=str(tmp_path / "ref"))
    run_call_dist(bam_p, binp, loci=bed, output_prefix=str(tmp_path / "dist"))
    assert _files(str(tmp_path / "ref")) == _files(str(tmp_path / "dist"))


WORKER = textwrap.dedent("""
    import os, sys
    pid, n, port, out_prefix, bam_p, binp = sys.argv[1:7]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=int(n), process_id=int(pid))
    from strling_tpu.parallel.call_dist import run_call_dist
    run_call_dist(bam_p, binp, output_prefix=out_prefix)
""")


def test_multi_process_matches_run_call(sample, tmp_path):
    d, bam_p, binp = sample
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_prefix = str(tmp_path / "mp_call")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", "12671", out_prefix,
             bam_p, binp],
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
    run_call(bam_p, binp, output_prefix=str(d / "ref_call2"))
    assert _files(str(d / "ref_call2")) == _files(out_prefix)
