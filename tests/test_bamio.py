"""Round-trip tests: pure-Python BAM writer <-> native C++ reader."""

import numpy as np
import pytest

from strling_tpu.io.bam import Bam
from strling_tpu.io.bamwrite import BamRecord, write_bam
from strling_tpu.io.fasta import Fasta, write_fasta

HEADER = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000\n@SQ\tSN:chr2\tLN:50000\n"
TARGETS = [("chr1", 100000), ("chr2", 50000)]


def make_records():
    recs = []
    # pairs along chr1
    for i in range(50):
        pos = 1000 + i * 37
        mpos = pos + 300
        seq = ("ACGT" * 40)[:100]
        recs.append(BamRecord(f"r{i}", 99, 0, pos, 60, "100M", 0, mpos, 400, seq))
        recs.append(BamRecord(f"r{i}", 147, 0, mpos, 60, "100M", 0, pos, -400, seq))
    # a soft-clipped read
    recs.append(BamRecord("sc1", 0, 0, 5000, 42, "20S70M10S", -1, -1, 0, "A" * 100))
    # chr2 read
    recs.append(BamRecord("c2", 0, 1, 777, 13, "100M", -1, -1, 0, "G" * 100))
    # no-coor unmapped pair at the end
    recs.append(BamRecord("u1", 77, -1, -1, 0, "*", -1, -1, 0, "AT" * 50))
    recs.append(BamRecord("u1", 141, -1, -1, 0, "*", -1, -1, 0, "TA" * 50))
    recs.sort(key=lambda r: (r.tid if r.tid >= 0 else 1 << 30, r.pos))
    return recs


@pytest.fixture(scope="module")
def bam_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("bam") / "test.bam"
    write_bam(str(p), HEADER, TARGETS, make_records())
    return str(p)


def test_header_and_targets(bam_path):
    b = Bam(bam_path)
    assert b.header_text == HEADER
    assert [t.name for t in b.targets] == ["chr1", "chr2"]
    assert [t.length for t in b.targets] == [100000, 50000]
    assert b.has_index


def test_stream_all(bam_path):
    b = Bam(bam_path, batch_size=7)  # force multiple batches
    n = 0
    qnames = []
    for batch in b.batches():
        n += len(batch)
        qnames.extend(batch.qnames())
    assert n == 104
    assert qnames[-2:] == ["u1", "u1"]  # no-coor block last


def test_fields_roundtrip(bam_path):
    b = Bam(bam_path)
    batches = list(b.batches())
    batch = batches[0]
    # first record is r0 at 1000
    assert batch.qname(0) == "r0"
    assert batch.pos[0] == 1000
    assert batch.flag[0] == 99
    assert batch.mapq[0] == 60
    assert batch.isize[0] == 400
    assert batch.end_pos[0] == 1100
    assert batch.seq_str(0) == ("ACGT" * 40)[:100]
    # find the soft-clipped read
    idx = [i for bt in batches for i in range(len(bt)) if bt.qname(i) == "sc1"]
    all_reads = [(bt, i) for bt in batches for i in range(len(bt))]
    sc = [(bt, i) for bt, i in all_reads if bt.qname(i) == "sc1"]
    bt, i = sc[0]
    assert bt.lclip[i] == 20 and bt.rclip[i] == 10
    assert bt.end_pos[i] == 5070
    ops = [(int(c) >> 4, "MIDNSHP=X"[int(c) & 0xF]) for c in bt.cigar_of(i)]
    assert ops == [(20, "S"), (70, "M"), (10, "S")]


def test_query_region(bam_path):
    b = Bam(bam_path)
    got = []
    for batch in b.query(0, 1000, 1200):
        got.extend(zip(batch.qnames(), batch.pos.tolist()))
    # reads overlapping [1000, 1200): starts 1000..1185 (r0..r5), plus none
    # from the mate block at 1300+
    starts = [p for _, p in got]
    assert min(starts) >= 1000 and max(starts) < 1200
    assert len(got) == len([i for i in range(50) if 1000 + i * 37 < 1200])


def test_query_overlap_semantics(bam_path):
    b = Bam(bam_path)
    got = []
    for batch in b.query(0, 1050, 1060):
        got.extend(batch.pos.tolist())
    # any 100M read with pos in (950, 1060) overlaps
    expected = [1000 + i * 37 for i in range(50) if 1000 + i * 37 < 1060 and 1000 + i * 37 + 100 > 1050]
    assert sorted(got) == sorted(expected)


def test_query_chr2(bam_path):
    b = Bam(bam_path)
    got = [q for batch in b.query(1, 0, 50000) for q in batch.qnames()]
    assert got == ["c2"]


def test_query_unmapped(bam_path):
    b = Bam(bam_path)
    got = [q for batch in b.query_unmapped() for q in batch.qnames()]
    assert got == ["u1", "u1"]
    for batch in b.query_unmapped():
        assert (batch.tid == -1).all()


def test_fasta_roundtrip(tmp_path):
    chroms = {"chr1": "ACGTACGTAA" * 13 + "GG", "chrM": "A" * 7}
    p = tmp_path / "ref.fa"
    write_fasta(str(p), chroms, width=10)
    fa = Fasta(str(p))
    assert fa.chrom_len("chr1") == 132
    assert fa.get("chr1") == chroms["chr1"]
    assert fa.get("chr1", 5, 14) == chroms["chr1"][5:15]
    assert fa.get("chr1", 125, 200) == chroms["chr1"][125:]
    assert fa.get("chrM") == "AAAAAAA"
    assert fa.names == ["chr1", "chrM"]
