"""Equivalence: collect_batched (production call path) vs the per-record
spec (collect.spanners / spanners_reference) and genotype_ls vs genotype.

The batched path must reproduce, bit-for-bit, every quantity `genotype`
reads from the spec's Support lists: spanning-read rows (order, repeat
count, indel), class counts, median depth, the float32 expected sum, and
the guard inputs.
"""

import numpy as np
import pytest

from strling_tpu.core.cluster import Bounds
from strling_tpu.core.collect import (
    Support,
    SupportType,
    spanners,
    spanners_many,
)
from strling_tpu.core.collect_batched import (
    LocusSupport,
    collect_many,
    collect_many_native,
)
from strling_tpu.core.genotyper import genotype, genotype_ls
from strling_tpu.core.tread import TREAD_DTYPE
from strling_tpu.io.bam import Bam
from strling_tpu.io.bamwrite import BamRecord, write_bam
from strling_tpu.utils.fraglen import NBINS
from strling_tpu.utils.options import Options


def _mk_bam(tmp_path, recs, targets=(("chr1", 10_000_000),)):
    path = str(tmp_path / "t.bam")
    hdr = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in targets
    )
    recs = sorted(recs, key=lambda r: (r.tid, r.pos))
    write_bam(path, hdr, list(targets), recs)
    return path


def _rand_reads(rng, n, lo, hi, tid=0, L=120):
    """Messy read population: varied cigars (S/I/D), flags, mapqs, pairs,
    cross-tid mates, extreme isizes, shared qnames."""
    out = []
    for i in range(n):
        p = int(rng.integers(lo, hi))
        isz = int(rng.integers(-6000, 6000))
        mq = int(rng.choice([0, 10, 20, 40, 60]))
        flag = 0x1 | 0x2
        if rng.random() < 0.5:
            flag |= 0x10
        if rng.random() < 0.05:
            flag |= 0x100
        if rng.random() < 0.05:
            flag |= 0x800
        if rng.random() < 0.05:
            flag |= 0x400
        mtid = tid if rng.random() < 0.9 else 1 - tid
        style = rng.random()
        if style < 0.5:
            cig = [(L, 0)]
        elif style < 0.7:
            s = int(rng.integers(5, 30))
            cig = [(s, 4), (L - s, 0)]
        elif style < 0.85:
            d = int(rng.integers(1, 40))
            cig = [(L // 2, 0), (d, 2), (L - L // 2, 0)]
        else:
            ins = int(rng.integers(1, 30))
            cig = [(L // 3, 0), (ins, 1), (L - L // 3 - ins, 0)]
        seq = "".join(
            np.array(list("ACGT"))[rng.integers(0, 4, L)]
        )
        if rng.random() < 0.3:
            u = "CAG"
            seq = (u * (L // 3 + 1))[:L]
        qn = f"q{int(rng.integers(0, n * 3 // 4))}"
        out.append(BamRecord(qn, flag, tid, p, mq,
                             cig, mtid, p + abs(isz) - L, isz, seq))
    return out


def _frag_sizes(rng):
    h = np.zeros(NBINS, np.uint32)
    sizes = rng.normal(400, 60, 4000).astype(int)
    sizes = sizes[(sizes > 0) & (sizes < NBINS)]
    np.add.at(h, sizes, 1)
    return h


def _ls_from_spans(spans, med, expected) -> LocusSupport:
    """Project a spec Support list onto the LocusSupport fields."""
    rc, ind = [], []
    n_span = n_frag = 0
    for s in spans:
        if s.Type == SupportType.SpanningRead:
            n_span += 1
            rc.append(s.SpanningReadRepeatCount)
            ind.append(
                s.SpanningReadCigarInsertionLen - s.SpanningReadCigarDeletionLen
            )
        elif s.Type == SupportType.SpanningFragment:
            n_frag += 1
    return LocusSupport(
        n_support=len(spans), n_spanning_reads=n_span,
        n_spanning_pairs=n_frag, span_rc=np.array(rc, np.int64),
        span_ind=np.array(ind, np.int64), med_depth=med,
        expected=np.float32(expected),
    )


def _assert_ls_equal(got: LocusSupport, want: LocusSupport, ctx=""):
    assert got.n_support == want.n_support, ctx
    assert got.n_spanning_reads == want.n_spanning_reads, ctx
    assert got.n_spanning_pairs == want.n_spanning_pairs, ctx
    assert got.med_depth == want.med_depth, ctx
    np.testing.assert_array_equal(got.span_rc, want.span_rc, err_msg=ctx)
    np.testing.assert_array_equal(got.span_ind, want.span_ind, err_msg=ctx)
    assert np.float32(got.expected).tobytes() == np.float32(
        want.expected
    ).tobytes(), (ctx, got.expected, want.expected)


def test_collect_many_matches_spec_fuzz(tmp_path):
    rng = np.random.default_rng(11)
    recs = []
    loci = []
    # overlapping and isolated loci, narrow and wide bounds, repeat units of
    # several lengths, including a locus with no reads at all
    layout = [
        (50_000, 50_030, "CAG"),
        (50_400, 50_410, "AT"),      # overlaps the first window
        (120_000, 120_001, "AAGGG"),  # 1bp bounds (slop kicks in)
        (200_000, 200_500, "A"),      # wide bounds
        (400_000, 400_040, "CAGG"),   # isolated
        (900_000, 900_004, "CT"),     # no reads anywhere near
    ]
    for lo, hi, rep in layout[:-1]:
        recs += _rand_reads(rng, 260, lo - 1200, hi + 1200)
    bam_path = _mk_bam(
        tmp_path, recs, targets=(("chr1", 10_000_000), ("chr2", 10_000_000))
    )
    for lo, hi, rep in layout:
        b = Bounds(tid=0, left=lo, right=hi, repeat=rep)
        loci.append(b)
    frag = _frag_sizes(rng)
    bam = Bam(bam_path)
    window = 500

    got = collect_many(bam, loci, window, frag, min_mapq=20, with_rc=True)
    native = collect_many_native(bam, loci, window, frag, min_mapq=20,
                                 with_rc=True)
    assert native is not None
    want = spanners_many(bam, loci, window, frag, min_mapq=20)
    assert set(got) == set(want) == set(native) == set(range(len(loci)))
    for i in range(len(loci)):
        spans, med, exp = want[i]
        ls = _ls_from_spans(spans, med, exp)
        _assert_ls_equal(got[i], ls, ctx=f"locus {i} (vectorized)")
        _assert_ls_equal(native[i], ls, ctx=f"locus {i} (native)")


def test_collect_matches_spec_many_seeds(tmp_path):
    # narrower fuzz, several seeds, single locus vs direct spanners
    for seed in (1, 2, 3, 7):
        rng = np.random.default_rng(seed)
        recs = _rand_reads(rng, 300, 48_000, 52_500)
        bam_path = _mk_bam(tmp_path, recs)
        frag = _frag_sizes(rng)
        bam = Bam(bam_path)
        b = Bounds(tid=0, left=50_000, right=50_000 + int(rng.integers(1, 60)),
                   repeat="CAG")
        window = int(rng.integers(300, 700))
        spans, med, exp = spanners(bam, b, window, frag, min_mapq=20)
        ls = _ls_from_spans(spans, med, exp)
        got = collect_many(bam, [b], window, frag, min_mapq=20,
                           with_rc=True)[0]
        _assert_ls_equal(got, ls, ctx=f"seed {seed} (vectorized)")
        nat = collect_many_native(bam, [b], window, frag, min_mapq=20,
                                  with_rc=True)[0]
        _assert_ls_equal(nat, ls, ctx=f"seed {seed} (native)")


def test_genotype_ls_matches_genotype(tmp_path):
    rng = np.random.default_rng(23)
    recs = _rand_reads(rng, 400, 48_500, 51_500)
    bam_path = _mk_bam(tmp_path, recs)
    frag = _frag_sizes(rng)
    bam = Bam(bam_path)
    b = Bounds(tid=0, left=50_000, right=50_030, repeat="CAG",
               n_left=3, n_right=2)
    window = 500
    spans, med, exp = spanners(bam, b, window, frag, min_mapq=20)
    assert med != -1 and len(spans) > 0
    got_ls = collect_many(bam, [b], window, frag, min_mapq=20,
                          with_rc=True)[0]

    tandems = np.zeros(7, TREAD_DTYPE)
    tandems["repeat_count"] = rng.integers(1, 45, 7)
    tandems["split"] = [3, 3, 0, 1, 3, 5, 4]
    qn = np.array([f"t{i//2}" for i in range(7)], object)

    class T:
        name = "chr1"

    opts = Options(median_fragment_length=400, targets=[T()])
    a = genotype(b, tandems, qn, spans, opts, float(med))
    a.expected_spanning_fragments = exp
    c = genotype_ls(b, tandems, qn, got_ls, opts, float(got_ls.med_depth))
    c.expected_spanning_fragments = got_ls.expected
    assert a.tostring() == c.tostring()

    # empty-support branch (allele1 NaN quirk)
    b2 = Bounds(tid=0, left=5_000_000, right=5_000_010, repeat="CAG")
    spans2, med2, exp2 = spanners(bam, b2, window, frag, min_mapq=20)
    ls2 = collect_many(bam, [b2], window, frag, min_mapq=20,
                       with_rc=True)[0]
    a2 = genotype(b2, tandems, qn, spans2, opts, float(med2))
    c2 = genotype_ls(b2, tandems, qn, ls2, opts, float(ls2.med_depth))
    assert a2.tostring() == c2.tostring()


def test_run_call_batched_matches_debug_spec(tmp_path):
    """Whole-file equality: run_call on the batched path vs the --debug
    (spec) path must produce byte-identical genotype/bounds/unplaced."""
    import os

    from strling_tpu.core.call import run_call
    from strling_tpu.core.extract import extract
    from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam
    from strling_tpu.io.binfmt import write_bin
    from strling_tpu.io.fasta import write_fasta

    rng = np.random.default_rng(5)
    G = 120_000
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, G)])
    seq = seq[:60_000] + "CAG" * 12 + seq[60_000:]
    ref = str(tmp_path / "ref.fa")
    write_fasta(ref, {"chr1": seq})
    bam_path = str(tmp_path / "s.bam")
    simulate_str_bam(ref, [Allele("chr1", 60_000, (0, 90), "CAG")], bam_path,
                     normal_hist(400, 50), depth=25, flank=11_000, seed=3)
    bam = Bam(bam_path)
    tb, frag, opts = extract(bam, None, None)
    binp = str(tmp_path / "s.bin")
    write_bin(binp, tb, frag, bam.header_text, 0.8, 40)

    run_call(bam_path, binp, output_prefix=str(tmp_path / "prod"))
    run_call(bam_path, binp, output_prefix=str(tmp_path / "spec"), debug=True)
    for suffix in ("-genotype.txt", "-bounds.txt", "-unplaced.txt"):
        prod = open(str(tmp_path / "prod") + suffix, "rb").read()
        spec = open(str(tmp_path / "spec") + suffix, "rb").read()
        assert prod == spec, suffix


def test_collect_production_config_matches_spec(tmp_path):
    """The shipped configuration (with_rc=False on both twins) must match
    the spec on every field EXCEPT span_rc (which it intentionally zeros):
    a regression inside the native want_rc skip branch must not hide
    behind the rc-enabled unit tests."""
    rng = np.random.default_rng(31)
    recs = _rand_reads(rng, 320, 48_000, 52_500)
    bam_path = _mk_bam(tmp_path, recs)
    frag = _frag_sizes(rng)
    bam = Bam(bam_path)
    b = Bounds(tid=0, left=50_000, right=50_040, repeat="CAG")
    spans, med, exp = spanners(bam, b, 500, frag, min_mapq=20)
    want = _ls_from_spans(spans, med, exp)
    for got in (
        collect_many(bam, [b], 500, frag, min_mapq=20)[0],
        collect_many_native(bam, [b], 500, frag, min_mapq=20)[0],
    ):
        assert got.n_support == want.n_support
        assert got.n_spanning_reads == want.n_spanning_reads
        assert got.n_spanning_pairs == want.n_spanning_pairs
        assert got.med_depth == want.med_depth
        np.testing.assert_array_equal(got.span_ind, want.span_ind)
        assert np.float32(got.expected).tobytes() == np.float32(
            want.expected).tobytes()
        assert not got.span_rc.any()

