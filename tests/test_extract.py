"""Extract-layer tests: adjust_by / unplaced_pair ports plus an end-to-end
extraction over a synthetic STR-expansion BAM."""

import numpy as np
import pytest

from strling_tpu.core.extract import Extractor, adjust_by, unplaced_pair
from strling_tpu.core.tread import Soft, Tread
from strling_tpu.io.bam import Bam
from strling_tpu.io.bamwrite import BamRecord, write_bam
from strling_tpu.utils.options import Options
from strling_tpu.utils import fraglen


def test_adjust_by_mate_clip():
    # tests/test_extract.nim:7-19 — real read pair from production data
    A = Tread(tid=2, position=86914345, repeat="CCG", mapping_quality=10,
              repeat_count=40, align_length=80)
    B = Tread(tid=16, position=17470852, split=Soft.none_right,
              mapping_quality=60, repeat_count=0, align_length=71)
    opts = Options(proportion_repeat=0.4, min_mapq=20)
    assert adjust_by(A, B, opts, B.position)
    assert A.position == B.position + B.align_length
    assert A.tid == 16
    assert A.split == Soft.none


def test_unplaced_pair():
    # tests/test_strling.nim:91-107
    opts = Options(median_fragment_length=500, proportion_repeat=0.8, min_mapq=20)
    A = Tread(repeat="AAAAAT", repeat_count=150, mapping_quality=30, align_length=0)
    B = Tread(repeat="AAAAAT", repeat_count=150, mapping_quality=30, align_length=0)
    assert unplaced_pair(A, B, opts) is True

    A = Tread(repeat="AAAAAT", repeat_count=150, mapping_quality=16, align_length=0)
    B = Tread(repeat="", repeat_count=0, mapping_quality=16, align_length=0)
    assert unplaced_pair(A, B, opts) is True

    A = Tread(repeat="", repeat_count=150, mapping_quality=30, align_length=0)
    B = Tread(repeat="", repeat_count=0, mapping_quality=30, align_length=0)
    assert unplaced_pair(A, B, opts) is False


HEADER = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:1000000\n"
TARGETS = [("chr1", 1000000)]


def _str_bam(path):
    """A tiny scenario: normal pairs + an STR read whose mate anchors it."""
    rng = np.random.default_rng(7)
    alphabet = np.array(list("ACGT"))

    def rand_seq(n):
        return "".join(alphabet[rng.integers(0, 4, n)])

    recs = []
    # background proper pairs for the fragment-length distribution
    for i in range(300):
        pos = 1000 + i * 29
        isz = 350 + int(rng.integers(-30, 30))
        mpos = pos + isz - 100
        recs.append(BamRecord(f"bg{i}", 99, 0, pos, 60, "100M", 0, mpos, isz, rand_seq(100)))
        recs.append(BamRecord(f"bg{i}", 147, 0, mpos, 60, "100M", 0, pos, -isz, rand_seq(100)))
    # an anchored pair: read1 maps well (anchor), read2 is pure CAG (mapq 0)
    anchor_pos = 50000
    recs.append(BamRecord("str1", 97, 0, anchor_pos, 60, "100M", 0, anchor_pos + 250, 350,
                          rand_seq(100)))
    recs.append(BamRecord("str1", 145, 0, anchor_pos + 250, 0, "100M", 0, anchor_pos, -350,
                          "CAG" * 33 + "C"))
    # a soft-clipped read at the locus: left 60bp CAG clip, 40bp match.
    # Its mate comes first so the clip is scanned on the mate-joined pass.
    recs.append(BamRecord("clip1", 99, 0, 50100, 60, "100M", 0, 50300, 300,
                          rand_seq(100)))
    recs.append(BamRecord("clip1", 147, 0, 50300, 60, "60S40M", 0, 50100, -300,
                          "CAG" * 20 + rand_seq(40)))
    # an unplaced STR pair (both unmapped, no coordinates)
    recs.append(BamRecord("unp1", 77, -1, -1, 0, "*", -1, -1, 0, "GAA" * 33 + "G"))
    recs.append(BamRecord("unp1", 141, -1, -1, 0, "*", -1, -1, 0, "TTC" * 33 + "T"))
    recs.sort(key=lambda r: (r.tid if r.tid >= 0 else 1 << 30, r.pos))
    write_bam(path, HEADER, TARGETS, recs)


@pytest.fixture(scope="module")
def str_bam(tmp_path_factory):
    p = tmp_path_factory.mktemp("ex") / "str.bam"
    _str_bam(str(p))
    return str(p)


def test_fragment_length_distribution(str_bam):
    bam = Bam(str_bam)
    fd = fraglen.fragment_length_distribution(bam)
    assert fd.sum() > 0
    med = fraglen.median(fd)
    assert 300 <= med <= 400


def test_extract_end_to_end(str_bam):
    bam = Bam(str_bam)
    fd = fraglen.fragment_length_distribution(bam)
    opts = Options(median_fragment_length=fraglen.median(fd),
                   proportion_repeat=0.8, min_mapq=40)
    ex = Extractor(opts, None, bam.targets)
    for batch in bam.batches():
        ex.process_batch(batch)
    for batch in bam.query_unmapped():
        ex.process_batch(batch)
    out = ex.cache.out
    by_q = {}
    for t in out:
        by_q.setdefault(t.qname, []).append(t)

    # the CAG read was adjusted next to its anchor
    assert "str1" in by_q
    strs = [t for t in by_q["str1"] if t.repeat]
    assert strs, by_q["str1"]
    t = strs[0]
    assert t.repeat in ("AGC", "CTG")  # min-rotation of CAG or its revcomp
    assert t.tid == 0
    # position placed relative to the anchor (mate) at 50000
    assert 49800 <= t.position <= 50800

    # soft-clip tread from clip1: left-clip at pos 50300
    assert "clip1" in by_q
    clips = [t for t in by_q["clip1"] if t.split == Soft.left]
    assert clips and clips[0].position == 50300
    assert clips[0].repeat == "AGC"

    # unplaced pair canonicalized to same repeat, tid -1 (processed twice:
    # once in the sequential scan and once via query("*"), as the reference
    # does — extract.nim:308,326)
    unp = by_q.get("unp1", [])
    assert len(unp) == 4
    assert all(t.tid == -1 and t.position == 0 for t in unp)
    assert {t.repeat for t in unp} == {"AAG"}


def test_extract_fast_path_equivalence(str_bam):
    """With a genome index covering the STR locus, exact-match reads elsewhere
    skip the kernel but the extracted treads are identical.

    (An index that *misses* a locus legitimately changes results — the
    reference trusts the index to skip full-length-M reads, extract.nim:29-34.)
    """
    from strling_tpu.core.genome_index import GenomeIndex

    bam = Bam(str_bam)
    opts = Options(median_fragment_length=350, proportion_repeat=0.8, min_mapq=40)
    gi = GenomeIndex({"chr1": [(49000, 52000)]})  # covers the CAG locus
    ex_fast = Extractor(opts, gi, bam.targets)
    for batch in bam.batches():
        ex_fast.process_batch(batch)
    for batch in bam.query_unmapped():
        ex_fast.process_batch(batch)

    bam2 = Bam(str_bam)
    ex_slow = Extractor(opts, None, bam2.targets)
    for batch in bam2.batches():
        ex_slow.process_batch(batch)
    for batch in bam2.query_unmapped():
        ex_slow.process_batch(batch)

    assert ex_fast.cache.out == ex_slow.cache.out
