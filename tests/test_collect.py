"""Support-collection tests ported from reference tests/test_collect.nim."""

import numpy as np

from strling_tpu.core.cluster import Bounds
from strling_tpu.core.collect import (
    Support,
    SupportType,
    overlapping_read,
    spanning_fragment,
)
from strling_tpu.core.spanning import cumulative, expected_spanning_probability
from strling_tpu.io.bam import Target
from strling_tpu.io.sam import record_from_string

TARGETS = [Target(0, "chr1", 10000)]


def test_overlapping_and_spanning_reads():
    # test_collect.nim:8-45
    a = record_from_string(
        "read1\t0\tchr1\t1\t40\t25M5S\t*\t0\t0\t" + "A" * 30 + "\t*", TARGETS
    )

    s1 = Support()
    b = Bounds(tid=0, left=50, right=100, repeat="A")
    assert overlapping_read(a, b, s1) is False

    s2 = Support()
    b = Bounds(tid=0, left=5, right=15, repeat="AAAAAA")
    assert overlapping_read(a, b, s2) is True
    assert s2.Type == SupportType.OverlappingRead

    s3 = Support()
    b = Bounds(tid=0, left=6, right=15, repeat="AAAAAA")
    assert overlapping_read(a, b, s3) is True
    assert s3.Type == SupportType.SpanningRead

    s4 = Support()
    b = Bounds(tid=0, left=9, right=10, repeat="AAAAAA")
    assert overlapping_read(a, b, s4) is True

    s5 = Support()
    b = Bounds(tid=0, left=10, right=11, repeat="AAAAAA")
    assert overlapping_read(a, b, s5) is True
    assert s5.Type == SupportType.SpanningRead


def test_spanning_pair():
    # test_collect.nim:47-73
    targets = [Target(0, "chr1", 100000)]
    a = record_from_string(
        "read1\t99\tchr1\t1\t40\t15M5S\tchr1\t500\t0\t" + "A" * 20 + "\t*", targets
    )
    b = record_from_string(
        "read1\t147\tchr1\t500\t40\t15M5S\tchr1\t1\t0\t" + "A" * 20 + "\t*", targets
    )
    frag = np.zeros(4096, np.uint32)

    s = Support()
    assert spanning_fragment(a, b, Bounds(tid=0, left=100, right=150, repeat="A"), s, frag)
    assert spanning_fragment(a, b, Bounds(tid=0, left=450, right=513, repeat="A"), s, frag)
    assert not spanning_fragment(a, b, Bounds(tid=0, left=512, right=513, repeat="A"), s, frag)


def test_cumulative_and_expected_probability():
    frag = np.zeros(4096, np.uint32)
    frag[300:420] = 100
    cd = cumulative(frag)
    assert cd[-1] == 1.0
    assert cd[0] == 0.0
    # monotone
    assert (np.diff(cd) >= 0).all()

    # a forward read far left of the event: spanning probability is high when
    # the distance is small relative to typical fragments
    r = record_from_string(
        "q\t99\tchr1\t101\t60\t100M\tchr1\t401\t400\t" + "A" * 100 + "\t*", TARGETS
    )
    p_near = expected_spanning_probability(cd, r, 150, 151)
    assert p_near > 0.9
    p_far = expected_spanning_probability(cd, r, 480, 481)
    assert 0 <= p_far <= p_near
    # reverse read left of event -> 0
    r2 = record_from_string(
        "q\t83\tchr1\t101\t60\t100M\tchr1\t401\t400\t" + "A" * 100 + "\t*", TARGETS
    )
    assert expected_spanning_probability(cd, r2, 150, 151) == 0.0


def test_genotyper_spanning_read_est():
    # tests/test_genotyper.nim:6-20
    from strling_tpu.core.genotyper import spanning_read_est

    reads = [
        Support(Type=SupportType.SpanningRead, SpanningReadRepeatCount=10,
                SpanningReadCigarInsertionLen=0, SpanningReadCigarDeletionLen=0,
                repeat="AT"),
        Support(Type=SupportType.SpanningRead, SpanningReadRepeatCount=10,
                SpanningReadCigarInsertionLen=0, SpanningReadCigarDeletionLen=0,
                repeat="AT"),
        Support(Type=SupportType.SpanningRead, SpanningReadRepeatCount=10,
                SpanningReadCigarInsertionLen=0, SpanningReadCigarDeletionLen=0,
                repeat="AT"),
        Support(Type=SupportType.SpanningRead, SpanningReadRepeatCount=9,
                SpanningReadCigarInsertionLen=0, SpanningReadCigarDeletionLen=2,
                repeat="AT"),
    ]
    est = spanning_read_est(reads)
    assert est.repeat == "AT"
    assert est.allele1_bp == 0.0
    assert est.allele2_bp == -2.0
    assert est.allele1_ru == 10.0
    assert est.allele2_ru == 9.0


def test_genotyper_anchored_lm():
    from strling_tpu.core.genotyper import anchored_lm

    assert anchored_lm(0, 30.0) != anchored_lm(0, 30.0)  # NaN
    # reference constants (genotyper.nim:121-124)
    import math

    v = anchored_lm(100, 30.0)
    y = math.log2(100 / 30.0 + 1) * 0.7565329 + 4.3558142
    assert abs(v - 2 ** y) < 1e-9


def test_spanners_vectorized_equivalence():
    """Vectorized spanners == per-record reference port on a sim BAM."""
    import tempfile

    from strling_tpu.core.collect import spanners, spanners_reference
    from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam
    from strling_tpu.io.bam import Bam
    from strling_tpu.io.fasta import write_fasta

    d = tempfile.mkdtemp()
    rng = np.random.default_rng(31)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 30000)])
    seq = seq[:15000] + "CAG" * 12 + seq[15000:]
    write_fasta(d + "/ref.fa", {"chr1": seq})
    hist = np.zeros(4096, np.uint32)
    hist[350:450] = 50
    simulate_str_bam(d + "/ref.fa", [Allele("chr1", 15000, (0, 60), "CAG")],
                     d + "/s.bam", hist, depth=30, flank=6000, seed=8)

    for left, right, rep in [(15000, 15036, "CAG"), (14800, 14801, "AGC"),
                             (15500, 15600, "A")]:
        b = Bounds(tid=0, left=left, right=right, repeat=rep)
        s1, d1, e1 = spanners(Bam(d + "/s.bam"), b, 500, hist)
        s2, d2, e2 = spanners_reference(Bam(d + "/s.bam"), b, 500, hist)
        assert d1 == d2
        assert e1 == e2
        assert [
            (x.Type, x.SpanningFragmentLength, x.SpanningReadRepeatCount,
             x.SpanningReadCigarInsertionLen, x.SpanningReadCigarDeletionLen,
             x.qname)
            for x in s1
        ] == [
            (x.Type, x.SpanningFragmentLength, x.SpanningReadRepeatCount,
             x.SpanningReadCigarInsertionLen, x.SpanningReadCigarDeletionLen,
             x.qname)
            for x in s2
        ], (left, right, rep)


def test_spanners_many_matches_per_locus(tmp_path):
    """spanners_many (one streaming pass per merged window region) must
    return results identical to per-locus spanners, including overlapping
    and adjacent windows and the region-cap fallback."""
    import numpy as np

    from strling_tpu.core.cluster import Bounds
    from strling_tpu.core.collect import spanners, spanners_many
    from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam
    from strling_tpu.io.bam import Bam
    from strling_tpu.io.fasta import build_fai, write_fasta
    import strling_tpu.core.collect as CO

    rng = np.random.default_rng(5)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 60000)])
    for pos in (15000, 15400, 30000):
        seq = seq[:pos] + "CAG" * 10 + seq[pos:]
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, {"chr1": seq})
    build_fai(fa, fa + ".fai")
    bam_p = str(tmp_path / "s.bam")
    simulate_str_bam(fa, [Allele("chr1", 15000, (0, 80), "CAG"),
                          Allele("chr1", 15430, (0, 60), "CAG"),
                          Allele("chr1", 30060, (0, 90), "CAG")],
                     bam_p, normal_hist(400, 50), depth=25, flank=8000,
                     seed=3)
    bam = Bam(bam_p)
    hist = normal_hist(400, 50)
    # two overlapping windows + one distant
    bl = [Bounds(tid=0, left=15000, right=15010, repeat="AGC"),
          Bounds(tid=0, left=15430, right=15445, repeat="AGC"),
          Bounds(tid=0, left=30060, right=30070, repeat="AGC")]

    def norm(res):
        spans, md, exp = res
        return ([f"{s.Type}|{s.qname}|{s.SpanningFragmentLength}|"
                 f"{s.SpanningReadRepeatCount}" for s in spans], md,
                float(exp))

    window = 450
    want = [norm(spanners(bam, b, window, hist)) for b in bl]
    got = spanners_many(bam, bl, window, hist)
    for i in range(3):
        assert norm(got[i]) == want[i], i
    # cap fallback path produces the same results
    old = CO.SPANNERS_REGION_CAP
    CO.SPANNERS_REGION_CAP = 10
    try:
        got2 = spanners_many(bam, bl, window, hist)
    finally:
        CO.SPANNERS_REGION_CAP = old
    for i in range(3):
        assert norm(got2[i]) == want[i], i
