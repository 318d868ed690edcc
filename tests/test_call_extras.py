"""call --loci flow, --debug outputs, pull_region, per-chrom merge, outliers
doctests."""

import numpy as np
import pytest

from strling_tpu.core.call import run_call
from strling_tpu.core.merge import run_merge
from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam
from strling_tpu.io.bam import Bam
from strling_tpu.io.binfmt import write_bin
from strling_tpu.io.fasta import write_fasta
from strling_tpu.core.extract import extract

LOCUS = 20000


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    d = tmp_path_factory.mktemp("cx")
    rng = np.random.default_rng(21)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 40000)])
    seq = seq[:LOCUS] + "CAG" * 10 + seq[LOCUS:]
    write_fasta(str(d / "ref.fa"), {"chr1": seq})
    simulate_str_bam(
        str(d / "ref.fa"), [Allele("chr1", LOCUS, (0, 120), "CAG")],
        str(d / "s.bam"), normal_hist(400, 50), depth=30, flank=8000, seed=5,
    )
    bam = Bam(str(d / "s.bam"))
    treads, frag_dist, _ = extract(bam, None, None)
    write_bin(str(d / "s.bin"), treads, frag_dist, bam.header_text, 0.8, 40)
    (d / "loci.bed").write_text(f"chr1\t{LOCUS}\t{LOCUS + 30}\tCAG\tTEST_HTT\n")
    return d


def test_call_with_loci(sim):
    prefix = str(sim / "loci_out")
    run_call(str(sim / "s.bam"), str(sim / "s.bin"), loci=str(sim / "loci.bed"),
             output_prefix=prefix)
    bl = open(prefix + "-bounds.txt").read().splitlines()
    # the provided locus is force-reported first with its name
    first = bl[1].split("\t")
    assert first[0] == "chr1" and first[1] == str(LOCUS)
    assert first[4] == "TEST_HTT"
    gl = [l.split("\t") for l in open(prefix + "-genotype.txt").read().splitlines()[1:]]
    hit = [r for r in gl if r[1] == str(LOCUS) and r[3] == "CAG"]
    assert hit, gl
    # NOTE faithful reference subtlety: the provided locus is keyed by its
    # bed spelling ("CAG", callclusters.nim:15) while detector units are
    # min-rotation ("AGC"), so the provided locus genotypes via spanning
    # evidence only (sum_str_counts 0); the size estimate appears on the
    # separately discovered min-rotation locus.
    assert int(hit[0][7]) > 0  # spanning reads support the provided locus
    novel = [r for r in gl if r[3] in ("AGC", "CTG") and abs(int(r[1]) - LOCUS) < 300]
    assert novel and any(float(r[5]) > 20 for r in novel)


def test_call_debug_outputs(sim):
    prefix = str(sim / "dbg_out")
    run_call(str(sim / "s.bam"), str(sim / "s.bin"), loci=str(sim / "loci.bed"),
             output_prefix=prefix, debug=True)
    reads = open(prefix + "-reads.txt").read().splitlines()
    spans = open(prefix + "-spanning.txt").read().splitlines()
    assert reads[0].startswith("#chrom")
    assert len(reads) > 1
    assert any("SpanningFragment" in l or "SpanningRead" in l for l in spans)


def test_pull_region(sim, tmp_path):
    from strling_tpu.core.pull_region import pull_region_main

    out = str(tmp_path / "pulled.bam")
    pull_region_main([
        "-o", out, str(sim / "s.bam"), f"chr1:{LOCUS - 200}-{LOCUS + 200}",
    ])
    b = Bam(out)
    qn = {}
    n = 0
    for batch in b.batches():
        n += len(batch)
        for q in batch.qnames():
            qn[q] = qn.get(q, 0) + 1
    assert n > 10
    # mates were hunted: most qnames appear twice
    two = sum(1 for v in qn.values() if v == 2)
    assert two >= len(qn) * 0.8


def test_merge_per_chromosome(sim):
    prefix = str(sim / "chrom_merge")
    run_merge([str(sim / "s.bin")], fasta=str(sim / "ref.fa"),
              chromosome="chr1", output_prefix=prefix)
    lines = open(prefix + "-bounds.txt").read().splitlines()
    assert lines[0].startswith("#chrom")
    hits = [l for l in lines[1:] if abs(int(l.split("\t")[1]) - LOCUS) < 1000]
    assert hits


def test_merge_unknown_chromosome(sim):
    with pytest.raises(ValueError, match="not found in fasta"):
        run_merge([str(sim / "s.bin")], fasta=str(sim / "ref.fa"),
                  chromosome="chr9", output_prefix=str(sim / "x"))


def test_outliers_doctests():
    import doctest

    import strling_tpu.core.outliers as mod

    results = doctest.testmod(mod)
    assert results.failed == 0


def test_p_adj_bh_reference_cases():
    # strling-outliers.py:146-162 doctest cases
    from strling_tpu.core.outliers import p_adj_bh

    out = p_adj_bh(np.array([np.nan, np.nan]))
    assert np.isnan(out).all()
    out = p_adj_bh(np.array([np.inf, -np.inf]))
    assert out[0] == np.inf and out[1] == -np.inf
    assert p_adj_bh(np.array([])).size == 0
    out = p_adj_bh(np.array([0.01, np.nan, 0.05]))
    assert np.isclose(out[0], 0.03, atol=0.01)
    assert np.isnan(out[1])
    assert np.isclose(out[2], 0.05, atol=0.01)


def test_huber_estimator_sane():
    from strling_tpu.core.outliers import Huber, hubers_est

    rng = np.random.default_rng(0)
    x = rng.normal(5.0, 2.0, 500)
    mu, sd = Huber(maxiter=1000)(x)
    assert abs(mu - 5.0) < 0.3
    assert abs(sd - 2.0) < 0.3
    # with outliers, Huber stays near the bulk
    x2 = np.concatenate([x, [1000.0] * 10])
    mu2, sd2 = Huber(maxiter=1000)(x2)
    assert abs(mu2 - 5.0) < 0.5
    # constant vector -> MAD fallback, sd NaN
    est = hubers_est(np.ones(10))
    assert est["mu"] == 1.0 and np.isnan(est["sd"])


def test_profile_trace_hook(tmp_path):
    """--profile captures a jax.profiler trace directory."""
    import os

    from strling_tpu.utils.profiling import maybe_trace

    import jax
    import jax.numpy as jnp

    d = str(tmp_path / "trace")
    with maybe_trace(d, "unit"):
        jnp.sum(jnp.arange(128.0)).block_until_ready()
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "no trace files written"


def test_hubers_est_batch_matches_scalar():
    """hubers_est_batch must agree row-for-row with the scalar hubers_est
    (Huber proposal-2 + MAD fallback, strling-outliers.py:115-136) across
    normal, outlier-spiked, constant (mad=0 -> fallback), NaN-bearing,
    singleton, and empty rows."""
    import pandas as pd
    from strling_tpu.core.outliers import hubers_est, hubers_est_batch

    rng = np.random.default_rng(42)
    rows = []
    rows.append(rng.normal(0, 1, 40))                       # clean
    rows.append(np.concatenate([rng.normal(5, 0.1, 30), [50.0, -40.0]]))
    rows.append(np.full(20, 3.25))                          # mad == 0
    r = rng.normal(0, 2, 25)
    r[::5] = np.nan                                         # NaN-bearing
    rows.append(r)
    rows.append(np.array([7.5]))                            # singleton
    rows.append(np.full(10, np.nan))                        # empty
    rows.append(np.concatenate([np.full(18, 1.0), [2.0, 3.0]]))
    r = rng.normal(0, 1, 12)
    r[3] = np.inf                                           # +inf value kept
    rows.append(r)
    r = rng.normal(0, 1, 12)
    r[0] = -np.inf                                          # -inf value kept
    r[5] = np.nan
    rows.append(r)
    for seed in range(10):
        rr = np.random.default_rng(seed)
        rows.append(rr.normal(rr.uniform(-3, 3), rr.uniform(0.01, 5), 35))
    W = max(len(r) for r in rows)
    X = np.full((len(rows), W), np.nan)
    for i, r in enumerate(rows):
        X[i, :len(r)] = r
    bmu, bsd, bmeth = hubers_est_batch(X)
    for i in range(len(rows)):
        ref = hubers_est(X[i])
        if np.isnan(ref["mu"]):
            assert np.isnan(bmu[i]), i
        else:
            np.testing.assert_allclose(bmu[i], ref["mu"], rtol=1e-12, err_msg=str(i))
        if np.isnan(ref["sd"]):
            assert np.isnan(bsd[i]), i
        else:
            np.testing.assert_allclose(bsd[i], ref["sd"], rtol=1e-12, err_msg=str(i))
        assert bmeth[i] == ref["method"], (i, bmeth[i], ref["method"])


def test_hubers_native_bitwise_matches_numpy():
    """The native batched Huber (io/csrc/huber.cc) replicates numpy's
    scalar pairwise summation; numpy's SIMD sum tree can differ by ~1 ulp,
    so results must agree to 4 ulp (outputs print at 2 significant digits,
    so this is far below visibility)."""
    from strling_tpu.core.outliers import _hubers_est_batch_np, hubers_est_batch

    rng = np.random.default_rng(7)
    L, S = 400, 130  # S > 128 exercises the recursive pairwise split
    X = rng.normal(-2, 1.5, (L, S))
    X[rng.random((L, S)) < 0.05] = np.nan
    X[:10] = 1.25  # constant rows -> MAD fallback
    X[10:20, 0] += 40  # outliers
    nmu, nsd, nmeth = hubers_est_batch(X)
    pmu, psd, pmeth = _hubers_est_batch_np(X)
    np.testing.assert_array_equal(nmeth, pmeth)
    np.testing.assert_array_equal(np.isnan(nmu), np.isnan(pmu))
    np.testing.assert_array_equal(np.isnan(nsd), np.isnan(psd))
    m = ~np.isnan(pmu)
    np.testing.assert_allclose(nmu[m], pmu[m], rtol=1e-15, atol=0)
    m = ~np.isnan(psd)
    np.testing.assert_allclose(nsd[m], psd[m], rtol=1e-15, atol=0)
