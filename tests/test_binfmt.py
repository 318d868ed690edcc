"""Bin format round-trip + msgpack wire-format checks."""

import numpy as np

from strling_tpu.core.tread import Soft, Tread, TreadBatch
from strling_tpu.io.binfmt import (
    _Unpacker,
    pack_tread,
    read_bin,
    write_bin,
)
from strling_tpu.io.bam import Target

HEADER = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000\n@SQ\tSN:chr2\tLN:50000\n"


def mk_treads():
    return TreadBatch.from_treads(
        [
            Tread(tid=0, position=1234, repeat="CAG", flag=99, split=Soft.none,
                  mapping_quality=60, repeat_count=40, align_length=150,
                  qname="read/1"),
            Tread(tid=1, position=999999, repeat="AAGGG", flag=147,
                  split=Soft.left, mapping_quality=0, repeat_count=30,
                  align_length=150, qname="r2"),
            Tread(tid=-1, position=0, repeat="A", flag=77, split=Soft.none,
                  mapping_quality=0, repeat_count=150, align_length=150,
                  qname="unplaced"),
        ]
    )


def test_wire_format_minimal_ints():
    out = bytearray()
    pack_tread(out, -1, 0, b"CAG", 77, 3, 0, 150, 150, b"q")
    b = bytes(out)
    # tid -1 -> negative fixint 0xff; position 0 -> 0x00; fixarray(6) 0x96
    assert b[0] == 0xFF
    assert b[1] == 0x00
    assert b[2] == 0x96
    assert b[3:6] == b"CAG"  # DNA chars < 128 pack as themselves
    assert b[6:9] == b"\x00\x00\x00"  # NUL padding chars
    assert b[9] == 77  # flag fixint
    assert b[10] == 3  # split
    assert b[11] == 0  # mapq
    assert b[12] == 0xCC and b[13] == 150  # repeat_count 150 -> uint8 form
    assert b[14] == 0xCC and b[15] == 150  # align_length
    assert b[16] == 1  # qname len uint32 -> fixint
    assert b[17] == 0xA1 and b[18:19] == b"q"  # fixstr(1)


def test_wire_format_large_values():
    out = bytearray()
    pack_tread(out, 300, 70000, b"", 40000, 5, 255, 0, 0, b"x" * 40)
    u = _Unpacker(bytes(out))
    tid, pos, rep, flag, split, mapq, rc, al, qn = __import__(
        "strling_tpu.io.binfmt", fromlist=["unpack_tread"]
    ).unpack_tread(u)
    assert (tid, pos, rep, flag, split, mapq, rc, al) == (
        300, 70000, b"", 40000, 5, 255, 0, 0)
    assert qn == b"x" * 40
    assert u.at_end()


def test_bin_roundtrip(tmp_path):
    p = tmp_path / "x.bin"
    tb = mk_treads()
    frag = np.zeros(4096, np.uint32)
    frag[400] = 1000
    write_bin(str(p), tb, frag, HEADER, 0.8, 40)
    ex = read_bin(str(p))
    assert [t.name for t in ex.targets] == ["chr1", "chr2"]
    assert ex.fragment_distribution[400] == 1000
    assert ex.proportion_repeat == np.float32(0.8)
    assert ex.min_mapq == 40
    back = ex.reads.to_treads()
    orig = tb.to_treads()
    assert back == orig


def test_bin_drop_unplaced_and_tid_filter(tmp_path):
    p = tmp_path / "x.bin"
    write_bin(str(p), mk_treads(), np.zeros(4096, np.uint32), HEADER, 0.8, 40)
    ex = read_bin(str(p), drop_unplaced=True)
    assert all(t.tid >= 0 for t in ex.reads.to_treads())
    ex2 = read_bin(str(p), requested_tid=1)
    assert [t.tid for t in ex2.reads.to_treads()] == [1]


def test_bin_tid_remap(tmp_path):
    p = tmp_path / "x.bin"
    write_bin(str(p), mk_treads(), np.zeros(4096, np.uint32), HEADER, 0.8, 40)
    # swap target order in the consumer's view (unpack.nim:94-107)
    new_targets = [Target(0, "chr2", 50000), Target(1, "chr1", 100000)]
    ex = read_bin(str(p), targets=new_targets)
    tids = [t.tid for t in ex.reads.to_treads()]
    assert tids == [1, 0, -1]
    assert ex.targets == new_targets


def test_native_writer_byte_identical(tmp_path):
    tb = mk_treads()
    frag = np.zeros(4096, np.uint32)
    frag[123] = 7
    p1 = tmp_path / "py.bin"
    p2 = tmp_path / "nat.bin"
    write_bin(str(p1), tb, frag, HEADER, 0.8, 40, native=False)
    write_bin(str(p2), tb, frag, HEADER, 0.8, 40, native=True)
    assert p1.read_bytes() == p2.read_bytes()


def test_native_reader_matches(tmp_path):
    from strling_tpu.io.bam import Target

    p = tmp_path / "x.bin"
    write_bin(str(p), mk_treads(), np.zeros(4096, np.uint32), HEADER, 0.8, 40)
    for kwargs in [
        {}, {"drop_unplaced": True}, {"requested_tid": 1},
        {"targets": [Target(0, "chr2", 50000), Target(1, "chr1", 100000)]},
        {"targets": [Target(0, "chr2", 50000), Target(1, "chr1", 100000)],
         "drop_unplaced": True},
    ]:
        a = read_bin(str(p), native=True, **kwargs)
        b = read_bin(str(p), native=False, **kwargs)
        assert a.reads.to_treads() == b.reads.to_treads(), kwargs
        assert a.targets == b.targets
        np.testing.assert_array_equal(a.fragment_distribution, b.fragment_distribution)


def test_native_reader_empty(tmp_path):
    from strling_tpu.core.tread import TreadBatch, TREAD_DTYPE

    p = tmp_path / "e.bin"
    tb = TreadBatch(data=np.zeros(0, TREAD_DTYPE), qnames=[])
    write_bin(str(p), tb, np.zeros(4096, np.uint32), HEADER, 0.8, 40)
    ex = read_bin(str(p))
    assert len(ex.reads) == 0
