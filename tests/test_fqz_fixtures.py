"""Hand-authored fqzcomp byte fixtures (VERDICT r4 item 5).

The rANSNx16/tok3 codecs have byte fixtures independent of the encoder
(test_cram_arith.py's hand-authored streams); fqzcomp's store_array table
format and per-record code order previously had only encoder<->decoder
round-trips. These fixtures close that gap:

- the store_array byte strings below are derived BY HAND from the wire
  format (runs per ascending value, 255-continuation chunks, the whole
  byte stream itself RLE'd with a repeat-count byte after any byte equal
  to its predecessor) and pin both directions: the native reader
  (sio_fqz_read_array_test) must decode them, and the Python writer
  (fqz_store_array) must produce exactly these bytes;
- the full-stream fixture was assembled by an independent re-derivation of
  the decoder's arithmetic (scripts/gen_fqz_fixture.py — no cramwrite
  import) and exercises the complete per-record order
  [selector][length][rev][dup][quals] with multi-param + stab + reverse.

External htscodecs parity remains unverifiable offline (docs/parity.md);
what these freeze is the wire format itself, so a drift in EITHER the
encoder or the decoder now fails loudly.
"""

import numpy as np

from strling_tpu.io.bam import _load


def _read_array(blob: bytes, size: int):
    import ctypes as C

    lib = _load()
    lib.sio_fqz_read_array_test.restype = C.c_int64
    lib.sio_fqz_read_array_test.argtypes = [
        C.c_char_p, C.c_int64, np.ctypeslib.ndpointer(np.uint8), C.c_int]
    out = np.zeros(size, np.uint8)
    n = lib.sio_fqz_read_array_test(blob, len(blob), out, size)
    return int(n), out


# (bytes, size, expected-table builder, what it pins)
STORE_ARRAY_FIXTURES = [
    # all-zero table of 256: one run of 256 = chunks [255, 1]
    # (255 continues, 1 stops); no outer-RLE repeats
    (b"\xff\x01", 256, lambda: np.zeros(256, np.uint8),
     "single full-size run with 255-continuation"),
    # stab split 1/255: v=0 run 1 -> [1]; v=1 run 255 -> [255, 0]
    # (a run of exactly 255 needs the explicit 0 terminator chunk)
    (b"\x01\xff\x00", 256,
     lambda: np.array([0] + [1] * 255, np.uint8),
     "exact-255 run needs a trailing 0 chunk"),
    # half/half split: byte stream [128, 128]; the second 128 equals its
    # predecessor so the outer RLE inserts a repeat count (0 = no extras)
    (b"\x80\x80\x00", 256,
     lambda: np.array([0] * 128 + [1] * 128, np.uint8),
     "outer RLE repeat-count byte after equal neighbour"),
    # zero-length runs skip values: v=0 run 250, v1..v3 run 0, v4 run 6;
    # byte stream [250, 0, 0, 0, 6] -> the 0-run bytes collapse through the
    # outer RLE as [0, 0, count=1]
    (b"\xfa\x00\x00\x01\x06", 256,
     lambda: np.array([0] * 250 + [4] * 6, np.uint8),
     "zero-run value skips + outer-RLE count > 0"),
    # ptab-sized (1024): v=0 run 510 = [255, 255, 0]; v=1 run 514 =
    # [255, 255, 4]; each doubled 255 takes an outer-RLE count byte
    (b"\xff\xff\x00\x00\xff\xff\x00\x04", 1024,
     lambda: np.array([0] * 510 + [1] * 514, np.uint8),
     "multi-chunk runs at ptab size"),
]


def test_store_array_hand_fixtures_decode():
    for blob, size, want, why in STORE_ARRAY_FIXTURES:
        n, got = _read_array(blob, size)
        assert n == len(blob), (why, n)
        assert np.array_equal(got, want()), why


def test_store_array_encoder_matches_fixtures():
    """The Python writer must emit exactly the hand-derived bytes for the
    same tables (the canonical encoding: maximal chunks, minimal RLE)."""
    from strling_tpu.io.cramwrite import fqz_store_array

    for blob, size, want, why in STORE_ARRAY_FIXTURES:
        assert bytes(fqz_store_array(want().tolist())) == blob, why


def test_store_array_truncation_fails():
    # chopping any fixture short must fail cleanly, not mis-decode
    for blob, size, _, why in STORE_ARRAY_FIXTURES:
        for cut in range(len(blob)):
            n, _ = _read_array(blob[:cut], size)
            assert n == -1, (why, cut)


# full-stream fixture from scripts/gen_fqz_fixture.py (independent RC):
#   header: vers=5, gflags=7 (MULTI_PARAM|HAVE_STAB|DO_REV), nparam=2,
#     max_sel=1, stab=[0]+[1]*255 (bytes 01 FF 00)
#   param0: context=0x0000 pflags=DO_LEN|DO_SEL max_sym=4 qbits=2 qshift=1
#   param1: context=0x0100 pflags=DO_DEDUP    max_sym=4
#   records (per-record order [selector][length][rev][dup][quals]):
#     r0: sel=0 len=5 rev=0        quals 1,2,3,0,1
#     r1: sel=1 (len inherited) rev=1 dup=0 quals 2,2,1,0,3 -> reversed
#     r2: sel=1 rev=0 dup=1 (copies r1's unreversed bytes)
#     r3: sel=0 len=3 rev=0        quals 3,3,3
FQZ_STREAM_FIXTURE = (
    b"\x05\x07\x02\x01\x01\xff\x00\x00\x00\x0c\x04!\x0c\x00\x00\x01\x02\x04"
    b"\x00\x00\x00\x00\x00\x04\xff\xff\xfb7\xa0k\xfd\xec\xff\xab\x9f/\xca"
    b"\x1f\xc3(\xfd\x00"
)
FQZ_STREAM_EXPECTED = (
    b"\x01\x02\x03\x00\x01"   # r0
    b"\x03\x00\x01\x02\x02"   # r1 after final reverse
    b"\x02\x02\x01\x00\x03"   # r2 = r1 unreversed (dup copies pre-reverse)
    b"\x03\x03\x03"           # r3
)


def test_fqz_full_stream_fixture():
    lib = _load()
    want = FQZ_STREAM_EXPECTED
    out = np.zeros(len(want) + 8, np.uint8)
    n = lib.sio_fqz_decode(FQZ_STREAM_FIXTURE, len(FQZ_STREAM_FIXTURE),
                           len(want), out, len(out))
    assert n == len(want)
    assert bytes(out[:len(want)]) == want


def test_fqz_full_stream_fixture_truncation_fails():
    lib = _load()
    want = FQZ_STREAM_EXPECTED
    out = np.zeros(len(want) + 8, np.uint8)
    for cut in (2, 6, 10, 20, len(FQZ_STREAM_FIXTURE) - 6):
        n = lib.sio_fqz_decode(FQZ_STREAM_FIXTURE[:cut], cut, len(want),
                               out, len(out))
        assert n == -1, cut
