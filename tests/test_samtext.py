"""Native plain-text SAM reader vs the BAM reader (htslib auto-detects
SAM/BAM/CRAM; extract.nim:275 relies on that)."""

import numpy as np
import pytest

from strling_tpu.io.bam import Bam
from strling_tpu.io.bamwrite import write_bam, write_sam

from tests.test_cram import HEADER, TARGETS, collect, make_records, make_ref


@pytest.fixture(scope="module")
def sam_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("sam")
    ref = make_ref()
    recs = make_records(ref)
    write_bam(str(d / "t.bam"), HEADER, TARGETS, recs)
    write_sam(str(d / "t.sam"), HEADER, TARGETS, recs)
    return d


def test_sam_stream_matches_bam(sam_paths):
    b = Bam(str(sam_paths / "t.bam"))
    s = Bam(str(sam_paths / "t.sam"))
    assert s.header_text == b.header_text
    assert [(t.name, t.length) for t in s.targets] == [
        (t.name, t.length) for t in b.targets
    ]
    assert not s.has_index
    assert collect(s.batches()) == collect(b.batches())


def test_sam_unmapped_scan(sam_paths):
    b = Bam(str(sam_paths / "t.bam"))
    s = Bam(str(sam_paths / "t.sam"))
    assert collect(s.query_unmapped()) == collect(b.query_unmapped())


def test_sam_region_query_rejected(sam_paths):
    s = Bam(str(sam_paths / "t.sam"))
    with pytest.raises(IOError):
        list(s.query(0, 0, 1000))


def test_extract_sam_equals_bam(sam_paths, tmp_path):
    from strling_tpu.core.extract import extract_native
    from strling_tpu.io.bamwrite import BamRecord

    recs = []
    for i in range(30):
        pos = 2000 + i * 67
        mpos = pos + 220
        tlen = mpos + 99 - pos
        recs.append(BamRecord(f"s{i}", 99, 0, pos, 60, "100M", 0, mpos, tlen,
                              "ACGTT" * 20))
        recs.append(BamRecord(f"s{i}", 147, 0, mpos, 3, "100M", 0, pos, -tlen,
                              ("ATT" * 34)[:100]))
    recs.sort(key=lambda r: (r.tid, r.pos))
    bam_p = str(tmp_path / "x.bam")
    sam_p = str(tmp_path / "x.sam")
    write_bam(bam_p, HEADER, TARGETS, recs)
    write_sam(sam_p, HEADER, TARGETS, recs)
    out = {}
    for name, path in [("bam", bam_p), ("sam", sam_p)]:
        treads, frag, _ = extract_native(Bam(path), None, None)
        out[name] = (treads, frag)
    assert np.array_equal(out["bam"][1], out["sam"][1])
    assert np.array_equal(out["bam"][0].data, out["sam"][0].data)
    assert out["bam"][0].qnames == out["sam"][0].qnames


@pytest.fixture(scope="module")
def gz_paths(sam_paths, tmp_path_factory):
    """The same SAM compressed two ways: plain gzip and BGZF (multi-member)."""
    import gzip

    d = tmp_path_factory.mktemp("samgz")
    text = open(str(sam_paths / "t.sam"), "rb").read()
    with gzip.open(str(d / "t.sam.gz"), "wb") as f:
        f.write(text)
    from strling_tpu.io.bamwrite import BgzfWriter

    w = BgzfWriter(str(d / "t_bgzf.sam.gz"))
    w.write(text)
    w.close()
    return d


def test_gzip_sam_matches_bam(sam_paths, gz_paths):
    b = Bam(str(sam_paths / "t.bam"))
    want = collect(b.batches())
    for name in ("t.sam.gz", "t_bgzf.sam.gz"):
        s = Bam(str(gz_paths / name))
        assert s.header_text == b.header_text
        assert collect(s.batches()) == want, name
        assert collect(s.query_unmapped()) == collect(b.query_unmapped()), name


def test_truncated_gzip_sam_raises(gz_paths, tmp_path):
    blob = open(str(gz_paths / "t.sam.gz"), "rb").read()
    p = tmp_path / "trunc.sam.gz"
    p.write_bytes(blob[: len(blob) * 2 // 3])
    s = Bam(str(p))
    with pytest.raises(IOError):
        for _ in s.batches():
            pass
