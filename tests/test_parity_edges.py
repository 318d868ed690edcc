"""Deep-parity edge cases: integer wraps, duplicate qnames, split clusters."""

import numpy as np
import pytest

from strling_tpu.core.extract import Extractor, adjust_by
from strling_tpu.core.tread import Soft, Tread
from strling_tpu.io.bam import Bam
from strling_tpu.io.bamwrite import BamRecord, write_bam
from strling_tpu.utils.options import Options


def test_adjust_by_uint32_wrap():
    """adjust_by near position 0 wraps in uint32 like the reference
    (extract.nim:156: B_position - median + ...)."""
    A = Tread(tid=0, position=50, repeat="AG", mapping_quality=0,
              repeat_count=70, align_length=150, flag=0x10)  # reverse
    B = Tread(tid=0, position=10, repeat="", mapping_quality=60,
              repeat_count=0, align_length=100, flag=0x20)
    B.flag = 0x10  # B reverse -> subtract path
    opts = Options(proportion_repeat=0.8, min_mapq=40,
                   median_fragment_length=5000)
    assert adjust_by(A, B, opts, B.position)
    # 10 - 5000 + 100 + 75 wraps mod 2^32
    assert A.position == (10 - 5000 + 100 + 75) % (1 << 32)


def test_p_repeat_uint8_product_wrap():
    # repeat_count * repeat_length wraps mod 256 (extract.nim:56-58)
    t = Tread(repeat="AGCAGC", repeat_count=100, align_length=200)
    assert t.p_repeat == ((100 * 6) % 256) / 200


def test_duplicate_qname_warning_drops_both(tmp_path, capsys):
    """bwa-kit-style duplicate first-of-pair reads: warn + drop
    (extract.nim:245-248)."""
    header = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000\n"
    seq = "CAG" * 33 + "C"
    recs = [
        BamRecord("dup1", 99, 0, 1000, 60, "100M", 0, 5000, 400, seq),
        BamRecord("dup1", 99, 0, 1100, 60, "100M", 0, 5000, 400, seq),
    ]
    p = tmp_path / "dup.bam"
    write_bam(str(p), header, [("chr1", 100000)], recs)
    bam = Bam(str(p))
    ex = Extractor(Options(proportion_repeat=0.8, min_mapq=40,
                           median_fragment_length=400), None, bam.targets)
    for b in bam.batches():
        ex.process_batch(b)
    assert ex.cache.out == []
    assert "dup1" not in ex.cache.tbl
    assert "bad read" in capsys.readouterr().err


def test_split_cluster_through_call_path():
    """Double locus (right peak then left peak) splits into two bounds."""
    from strling_tpu.core.callclusters import bounds_checked
    from strling_tpu.core.cluster import Cluster, trcluster
    from strling_tpu.core.tread import TREAD_DTYPE

    reads = []
    # locus A at ~1000: right clips; locus B at ~1400: left clips
    for p, s in (
        [(900, Soft.none)] * 3
        + [(1000, Soft.right)] * 5
        + [(1400, Soft.left)] * 5
        + [(1500, Soft.none)] * 3
    ):
        reads.append((0, "AAG", p, s))
    arr = np.zeros(len(reads), TREAD_DTYPE)
    for i, (tid, rep, pos, s) in enumerate(reads):
        arr[i] = (tid, pos, rep.encode(), 0, int(s), 0, 0, 0, 0)
    clusters = list(trcluster(arr, 800, 3))
    assert len(clusters) == 2
    b1, ok1 = bounds_checked(clusters[0], 0, 0, 500)
    b2, ok2 = bounds_checked(clusters[1], 0, 0, 500)
    assert ok1 and ok2
    assert b1.right == 1000  # modal right-clip position
    assert b2.left == 1400  # modal left-clip position
    assert b1.right_most < b2.left_most or b1.right_most <= b2.left


def test_overlapping_read_cigar_indel_wrap():
    """Spanning-read indel sums accumulate as uint8 (collect.nim:113-116)."""
    from strling_tpu.core.cluster import Bounds
    from strling_tpu.core.collect import Support, overlapping_read
    from strling_tpu.io.sam import Record

    # 300bp of insertions across ops wraps mod 256
    rec = Record(qname="q", flag=0, tid=0, pos=100, mapq=60,
                 cigar=[(50, 0), (200, 1), (100, 1), (50, 0)],
                 mate_tid=-1, mate_pos=-1, isize=0, seq="A" * 400)
    b = Bounds(tid=0, left=120, right=130, repeat="A")
    s = Support()
    assert overlapping_read(rec, b, s)
    assert s.Type == "SpanningRead"
    assert s.SpanningReadCigarInsertionLen == (200 + 100) % 256


def test_same_position_pair_tie(tmp_path):
    """pos == mate_pos: after_mate falls back to the cache-presence check
    (extract.nim:60-61); native and Python engines must agree."""
    from strling_tpu.core.extract import extract, extract_native

    header = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000\n"
    seq_str = "AAG" * 33 + "A"
    rng = np.random.default_rng(0)
    rand = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 100)])
    recs = [
        # both mates at the same position; one is STR with mapq 0
        BamRecord("tie1", 99, 0, 2000, 60, "100M", 0, 2000, 100, rand),
        BamRecord("tie1", 147, 0, 2000, 0, "100M", 0, 2000, -100, seq_str),
        # an N-heavy read pair (detector skips >20 Ns)
        BamRecord("nn1", 99, 0, 3000, 60, "100M", 0, 3300, 400,
                  "N" * 30 + rand[:70]),
        BamRecord("nn1", 147, 0, 3300, 60, "100M", 0, 3000, -400, rand),
        # zero-length-seq record (SEQ "*")
        BamRecord("z1", 99, 0, 4000, 60, "100M", 0, 4300, 400, ""),
        BamRecord("z1", 147, 0, 4300, 60, "100M", 0, 4000, -400, rand),
    ]
    p = tmp_path / "tie.bam"
    write_bam(str(p), header, [("chr1", 100000)], recs)

    tb_py, fd1, _ = extract(Bam(str(p)), None, None)
    tb_nat, fd2, _ = extract_native(Bam(str(p)), None, None)
    assert tb_py.to_treads() == tb_nat.to_treads()
    # the tie pair's STR read got anchored by its mate
    strs = [t for t in tb_py.to_treads() if t.qname == "tie1" and t.repeat]
    assert strs and strs[0].repeat in ("AAG", "CTT")
