"""Streaming-path edge cases for collect_batched: chunk boundaries and
buffer drops (CHUNK_READS crossings), super-region join invariance
(JOIN_GAP), and the 20k distinct-pair abort — all against the per-record
spec."""

import numpy as np
import pytest

import strling_tpu.core.collect_batched as cb
from strling_tpu.core.cluster import Bounds
from strling_tpu.core.collect import spanners, spanners_many
from strling_tpu.io.bam import Bam
from strling_tpu.io.bamwrite import BamRecord, write_bam
from tests.test_collect_batched import (
    _assert_ls_equal,
    _frag_sizes,
    _ls_from_spans,
    _mk_bam,
    _rand_reads,
)


def test_chunked_stream_matches_unchunked(tmp_path, monkeypatch):
    """Force many chunk crossings (tiny CHUNK_READS): buffered batches are
    dropped and rebuilt mid-region; per-locus results must not change."""
    rng = np.random.default_rng(41)
    recs = []
    loci = []
    for j in range(6):
        lo = 40_000 + j * 2_000  # windows overlap -> one long region
        recs += _rand_reads(rng, 220, lo - 900, lo + 900)
        loci.append(Bounds(tid=0, left=lo, right=lo + 25, repeat="CAG"))
    bam_path = _mk_bam(tmp_path, recs)
    frag = _frag_sizes(rng)
    bam = Bam(bam_path)

    want = spanners_many(bam, loci, 500, frag, min_mapq=20)
    monkeypatch.setattr(cb, "CHUNK_READS", 64)  # every batch triggers
    got = cb.collect_many(bam, loci, 500, frag, min_mapq=20, with_rc=True)
    for i in range(len(loci)):
        spans, med, exp = want[i]
        _assert_ls_equal(got[i], _ls_from_spans(spans, med, exp),
                         ctx=f"locus {i} tiny-chunk")


def test_join_gap_invariance(tmp_path, monkeypatch):
    """Results must be identical whether nearby components are merged into
    one streaming query (large JOIN_GAP) or queried separately (0)."""
    rng = np.random.default_rng(43)
    recs = []
    loci = []
    for j in range(4):
        lo = 100_000 + j * 9_000  # distinct components, within default gap
        recs += _rand_reads(rng, 180, lo - 900, lo + 900)
        loci.append(Bounds(tid=0, left=lo, right=lo + 30, repeat="AT"))
    bam_path = _mk_bam(tmp_path, recs)
    frag = _frag_sizes(rng)
    bam = Bam(bam_path)

    monkeypatch.setattr(cb, "JOIN_GAP", 0)
    split_res = cb.collect_many(bam, loci, 500, frag, min_mapq=20,
                                with_rc=True)
    monkeypatch.setattr(cb, "JOIN_GAP", 10_000_000)
    joined_res = cb.collect_many(bam, loci, 500, frag, min_mapq=20,
                                 with_rc=True)
    for i in range(len(loci)):
        _assert_ls_equal(joined_res[i], split_res[i], ctx=f"locus {i}")


def test_high_depth_abort_matches_spec(tmp_path):
    """>20k distinct pair qnames in one window must abort the locus
    ([], -1, 0) on the spec, the vectorized twin and the native path."""
    L = 100
    recs = []
    for i in range(20_100):
        p = 50_000 + (i % 800)
        recs.append(BamRecord(f"q{i}", 0x63, 0, p, 60, [(L, 0)], 0,
                              p + 200, 300, "A" * L))
    bam_path = _mk_bam(tmp_path, recs)
    rng = np.random.default_rng(1)
    frag = _frag_sizes(rng)
    bam = Bam(bam_path)
    b = Bounds(tid=0, left=50_400, right=50_430, repeat="CAG")

    spans, med, exp = spanners(bam, b, 500, frag, min_mapq=20)
    assert (spans, med, float(exp)) == ([], -1, 0.0)
    for got in (
        cb.collect_many(bam, [b], 500, frag, min_mapq=20)[0],
        cb.collect_many_native(bam, [b], 500, frag, min_mapq=20)[0],
    ):
        assert got.med_depth == -1
        assert got.n_support == 0
        assert float(got.expected) == 0.0
