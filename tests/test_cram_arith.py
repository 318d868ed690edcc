"""CRAM 3.1 adaptive-arithmetic (method 6) and fqzcomp (method 7) codecs:
Python encoder (io/cramwrite.py) vs native decoder (io/csrc/cram.cc)
round-trips, plus corrupt-input robustness.

Like the rANSNx16/tok3 pairs, both sides are written independently from the
CRAM 3.1 codecs description and validated against each other (no external
htscodecs tooling exists in this environment — docs/parity.md)."""

import random

import numpy as np

from strling_tpu.io.bam import _load
from strling_tpu.io.cramwrite import arith_encode, fqz_encode, tok3_encode


def native_arith_decode(blob: bytes, out_sz: int) -> bytes:
    lib = _load()
    out = np.zeros(max(out_sz, 1), np.uint8)
    n = lib.sio_arith_decode(blob, len(blob), out_sz, out, len(out))
    assert n == out_sz, f"arith decode returned {n}, want {out_sz}"
    return bytes(out[:out_sz])


def native_fqz_decode(blob: bytes, out_sz: int) -> bytes:
    lib = _load()
    out = np.zeros(max(out_sz, 1), np.uint8)
    n = lib.sio_fqz_decode(blob, len(blob), out_sz, out, len(out))
    assert n == out_sz, f"fqz decode returned {n}, want {out_sz}"
    return bytes(out[:out_sz])


def arith_cases():
    rng = random.Random(77)
    return [
        b"",
        b"\x00",
        b"z",
        b"abcabc",
        b"\x00" * 2000,                                    # single symbol
        b"ACGTACGTACGT" * 100,                             # tiny alphabet
        bytes(range(256)) * 4,                             # full alphabet
        bytes(rng.randrange(256) for _ in range(9001)),    # incompressible
        bytes(rng.choice(b"ACGTN") for _ in range(4099)),  # seq-like
        b"AAAAABBBCCCCCCCCD" * 300,                        # heavy runs
        bytes(rng.choice(b"\x01\xff") for _ in range(513)),
    ]


def test_arith_order0_roundtrip():
    for data in arith_cases():
        blob = arith_encode(data, order=0)
        assert native_arith_decode(blob, len(data)) == data


def test_arith_order1_roundtrip():
    for data in arith_cases():
        blob = arith_encode(data, order=1)
        assert native_arith_decode(blob, len(data)) == data


def test_arith_rle_roundtrip():
    for data in arith_cases():
        for order in (0, 1):
            blob = arith_encode(data, order=order, rle=True)
            assert native_arith_decode(blob, len(data)) == data


def test_arith_pack_roundtrip():
    rng = random.Random(5)
    for nsym in (1, 2, 3, 4, 7, 16):
        syms = bytes(range(40, 40 + nsym))
        data = bytes(rng.choice(syms) for _ in range(3001))
        for order in (0, 1):
            blob = arith_encode(data, order=order, pack=True)
            assert native_arith_decode(blob, len(data)) == data


def test_arith_cat_and_stripe():
    rng = random.Random(6)
    data = bytes(rng.randrange(256) for _ in range(2345))
    assert native_arith_decode(arith_encode(data, cat=True), len(data)) == data
    for X in (2, 3, 4):
        blob = arith_encode(data, order=1, stripe=X)
        assert native_arith_decode(blob, len(data)) == data


def test_arith_corrupt_streams_fail_cleanly():
    lib = _load()
    rng = random.Random(8)
    data = bytes(rng.choice(b"ACGT") for _ in range(500))
    blob = bytearray(arith_encode(data, order=1, rle=True))
    out = np.zeros(len(data), np.uint8)
    # truncations: must return -1 or a short count, never crash
    for cut in range(0, len(blob), 7):
        trial = bytes(blob[:cut])
        lib.sio_arith_decode(trial, len(trial), len(data), out, len(out))
    # bit flips
    for _ in range(64):
        trial = bytearray(blob)
        trial[rng.randrange(len(trial))] ^= 1 << rng.randrange(8)
        lib.sio_arith_decode(bytes(trial), len(trial), len(data), out,
                             len(out))


def qual_recs(rng, n, lo=33, hi=74, lmin=50, lmax=151):
    out = []
    for _ in range(n):
        ln = rng.randrange(lmin, lmax + 1)
        q = bytearray()
        cur = rng.randrange(lo, hi)
        for _ in range(ln):
            cur = min(hi - 1, max(lo, cur + rng.randrange(-2, 3)))
            q.append(cur)
        out.append(bytes(q))
    return out


def test_fqz_basic_roundtrip():
    rng = random.Random(11)
    recs = qual_recs(rng, 40)
    blob = fqz_encode(recs)
    want = b"".join(recs)
    assert native_fqz_decode(blob, len(want)) == want


def test_fqz_fixed_len_stream():
    """do_len=False: only the first record's length is coded; all records
    must share it (the common fixed-length-lane layout)."""
    rng = random.Random(12)
    recs = qual_recs(rng, 30, lmin=100, lmax=100)
    blob = fqz_encode(recs, do_len=False)
    want = b"".join(recs)
    assert native_fqz_decode(blob, len(want)) == want


def test_fqz_dedup_and_tables():
    rng = random.Random(13)
    recs = qual_recs(rng, 20, lmin=80, lmax=80)
    recs = [recs[0]] + [recs[0]] * 2 + recs[1:] + [recs[3]]  # adjacent dups
    recs[3 + 1] = recs[3]  # one more adjacent duplicate pair
    qtab = [min(i, 15) for i in range(256)]       # coarse quality history
    ptab = [min(i // 16, 15) for i in range(1024)]  # bucketed position
    dtab = [min(i, 7) for i in range(256)]
    blob = fqz_encode(recs, do_dedup=True, qbits=6, qshift=3, qloc=4,
                      ploc=10, dloc=0, qtab=qtab, ptab=ptab, dtab=dtab)
    want = b"".join(recs)
    assert native_fqz_decode(blob, len(want)) == want


def test_fqz_qmap():
    """Binned qualities through an explicit code->quality map."""
    rng = random.Random(14)
    qmap = bytes([33, 45, 60, 70])
    recs = [bytes(rng.choice(qmap) for _ in range(120)) for _ in range(25)]
    blob = fqz_encode(recs, qmap=qmap, qbits=4, qshift=2)
    want = b"".join(recs)
    assert native_fqz_decode(blob, len(want)) == want


def test_fqz_corrupt_streams_fail_cleanly():
    lib = _load()
    rng = random.Random(15)
    recs = qual_recs(rng, 8)
    want = b"".join(recs)
    blob = bytearray(fqz_encode(recs))
    out = np.zeros(len(want), np.uint8)
    for cut in range(0, len(blob), 5):
        trial = bytes(blob[:cut])
        lib.sio_fqz_decode(trial, len(trial), len(want), out, len(out))
    for _ in range(64):
        trial = bytearray(blob)
        trial[rng.randrange(len(trial))] ^= 1 << rng.randrange(8)
        lib.sio_fqz_decode(bytes(trial), len(trial), len(want), out, len(out))


def test_tok3_arith_streams():
    """Name tokeniser with use_arith=1: token sub-streams ride the adaptive
    coder instead of rANSNx16."""
    lib = _load()
    names = [f"SRR1234.{i} extra{i % 3}" for i in range(1, 200)]
    names += [f"read:{i:06d}:xyz" for i in range(500, 600)]
    blob = b"".join(n.encode() + b"\x00" for n in names)
    enc = tok3_encode(blob, use_arith=True)
    out = np.zeros(len(blob), np.uint8)
    n = lib.sio_tok3_decode(enc, len(enc), len(blob), out, len(out))
    assert n == len(blob)
    assert bytes(out[:n]) == blob


def test_cram31_arith_file_roundtrip(tmp_path):
    """Whole CRAM 3.1 file whose blocks use the adaptive arithmetic codec,
    fqzcomp for stored qualities and arithmetic tok3 name streams: must
    decode to the same records as the BAM, both with QS-skip (default) and
    with full decode (STRLING_CRAM_DECODE_ALL=1 subprocess)."""
    import os
    import subprocess
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_cram import (HEADER, TARGETS, assert_same_records, make_records,
                           make_ref)
    from strling_tpu.io.bamwrite import BamRecord, write_bam
    from strling_tpu.io.cramwrite import write_cram
    from strling_tpu.io.fasta import write_fasta

    ref = make_ref()
    rng = random.Random(21)
    recs = []
    for r in make_records(ref):
        recs.append(BamRecord(r.qname, r.flag, r.tid, r.pos, r.mapq,
                              list(r.cigar), r.mate_tid, r.mate_pos, r.isize,
                              r.seq,
                              qual=bytes(rng.randrange(0, 42)
                                         for _ in r.seq)))
    d = tmp_path
    fa = str(d / "ref.fa")
    write_fasta(fa, ref)
    bam = str(d / "a.bam")
    write_bam(bam, HEADER, TARGETS, recs)
    p = str(d / "a31.cram")
    write_cram(p, HEADER, TARGETS, recs, fasta=fa, slice_size=57, v31=True,
               v31_arith=True)
    with open(p, "rb") as f:
        assert f.read(6) == b"CRAM\x03\x01"
    # default mode: QS blocks skipped, arith/tok3a blocks decoded
    assert_same_records(bam, p, fasta=fa)

    # decode-all subprocess: the fqz QS block must decode in situ
    script = d / "dump.py"
    script.write_text(
        "import sys\n"
        "sys.path.insert(0, %r)\n"
        "sys.path.insert(0, %r)\n"
        "from strling_tpu.io.bam import Bam\n"
        "from test_cram import collect\n"
        "c = Bam(sys.argv[1], fasta=sys.argv[2])\n"
        "recs = collect(c.batches())\n"
        "import hashlib\n"
        "print(hashlib.sha256(repr(recs).encode()).hexdigest())\n"
        % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
           os.path.dirname(os.path.abspath(__file__)))
    )
    env_skip = dict(os.environ)
    env_skip.pop("STRLING_CRAM_DECODE_ALL", None)
    env_full = dict(env_skip, STRLING_CRAM_DECODE_ALL="1")
    outs = []
    for env in (env_skip, env_full):
        r = subprocess.run(
            [sys.executable, str(script), p, fa],
            capture_output=True, timeout=120, env=env,
        )
        assert r.returncode == 0, r.stderr.decode()[-800:]
        outs.append(r.stdout.strip())
    assert outs[0] == outs[1]


def test_fqz_store_array_roundtrip():
    """fqz_store_array <-> csrc fqz_read_array on bucket-map shapes,
    including 255-run continuations."""
    from strling_tpu.io.cramwrite import fqz_encode31, fqz_store_array

    tables = [
        [min(i, 15) for i in range(256)],
        [min(i // 16, 15) for i in range(1024)],
        [0] * 256,
        [0] * 300 + [1] * 700 + [2] * 24,   # >255 runs
        list(range(256)),                   # identity
        [5] * 1024,                         # single value, long run
    ]
    # exercised through full streams: a qtab/ptab table pair per stream
    rng = np.random.default_rng(0)
    for t in tables:
        recs = [bytes(rng.integers(33, 43, 60).astype(np.uint8))
                for _ in range(8)]
        qt = t[:256] if len(t) >= 256 else (t + [t[-1]] * (256 - len(t)))
        qt = [min(v, 255) for v in qt]
        pt = (t + [t[-1]] * 1024)[:1024]
        blob = fqz_encode31(recs, [dict(qtab=qt, ptab=pt, qbits=5,
                                        qshift=2)])
        want = b"".join(recs)
        assert native_fqz_decode(blob, len(want)) == want


def test_fqz_multi_param_selector():
    """gflags 1|2: two parameter sets, explicit selector table, selector
    mixed into the context (do_sel) for one of them."""
    from strling_tpu.io.cramwrite import fqz_encode31

    rng = np.random.default_rng(1)
    recs, sels = [], []
    for i in range(40):
        if i % 3 == 0:
            recs.append(bytes([40] * 80))       # flat qual -> param 1
            sels.append(1)
        else:
            recs.append(bytes(rng.integers(33, 73, 80).astype(np.uint8)))
            sels.append(0)
    params = [
        dict(qbits=8, qshift=5, qloc=7, ploc=0, dloc=13, do_sel=True,
             sloc=0),
        dict(qbits=2, qshift=1, qloc=7, ploc=0, dloc=13, context=0x1234),
    ]
    stab = [0, 1] + [1] * 254
    blob = fqz_encode31(recs, params, selectors=sels, stab=stab)
    assert blob[1] & 3 == 3  # MULTI_PARAM | HAVE_STAB
    want = b"".join(recs)
    assert native_fqz_decode(blob, len(want)) == want


def test_fqz_reverse_records():
    """gflag 4: flagged records are stored reversed; the decoder must
    un-reverse them."""
    from strling_tpu.io.cramwrite import fqz_encode31

    rng = np.random.default_rng(2)
    recs = [bytes(np.sort(rng.integers(33, 73, 50)).astype(np.uint8))
            for _ in range(30)]
    rev = [i % 2 == 1 for i in range(30)]
    blob = fqz_encode31(recs, [dict()], reverse=rev)
    assert blob[1] & 4
    want = b"".join(recs)
    assert native_fqz_decode(blob, len(want)) == want


def test_fqz_all_shapes_combined():
    """multi-param + stab + do_sel + reverse + dedup + variable lengths."""
    from strling_tpu.io.cramwrite import fqz_encode31

    rng = np.random.default_rng(3)
    recs, sels, rev = [], [], []
    for i in range(60):
        L = int(rng.integers(20, 120))
        if i % 4 == 0 and recs:
            recs.append(recs[-1])  # dedup candidates (same param + length)
            sels.append(sels[-1])
        else:
            recs.append(bytes(rng.integers(33, 63, L).astype(np.uint8)))
            sels.append(int(rng.integers(0, 3)))
        rev.append(bool(rng.integers(0, 2)))
    params = [
        dict(do_dedup=True, do_sel=True, sloc=14,
             qtab=[min(i, 31) for i in range(256)]),
        dict(qbits=4, qshift=2, context=7,
             ptab=[min(i // 32, 15) for i in range(1024)]),
    ]
    stab = [0, 0, 1] + [1] * 253
    blob = fqz_encode31(recs, params, selectors=sels, stab=stab, reverse=rev)
    want = b"".join(recs)
    assert native_fqz_decode(blob, len(want)) == want


def native_nx16_decode(blob: bytes, out_sz: int) -> bytes:
    lib = _load()
    out = np.zeros(max(1, out_sz), np.uint8)
    n = lib.sio_rans_nx16_decode(blob, len(blob), out_sz, out, len(out))
    assert n == out_sz, f"nx16 decode returned {n}, want {out_sz}"
    return bytes(out[:out_sz])


def test_hand_authored_nx16_fixtures():
    """Hand-constructed rANSNx16 streams (not produced by our encoder):
    independent ground truth for the container framing per the CRAM 3.1
    codecs spec. CAT (flag 32) = [flags, uint7 len, raw bytes]; PACK
    (flag 128) on top maps 2 symbols to 1 bit each, 8 per packed byte."""
    # CAT: flags=0x20, len=5 (uint7), payload verbatim
    blob = bytes([0x20, 5]) + b"HELLO"
    assert native_nx16_decode(blob, 5) == b"HELLO"
    # CAT + NOSZ (flag 16): no in-band length
    blob = bytes([0x30]) + b"ABC"
    assert native_nx16_decode(blob, 3) == b"ABC"
    # PACK+CAT: 2 symbols {65,67}, 8 x 1-bit per byte. Packed stream of
    # len 2 unpacks to 16: bits LSB-first select P[0]/P[1].
    # byte 0b01010101 -> A C A C A C A C (LSB first: 1,0,1,0.. -> C A C A..)
    packed = bytes([0b01010101, 0b00001111])
    blob = bytes([0xA0, 16,  # flags PACK|CAT, ulen=16 (post-unpack)
                  2, 65, 67,  # nsym, symbol table
                  2]) + packed  # packed byte count (uint7), then CAT bytes
    want = b"CACACACA" + b"CCCCAAAA"
    assert native_nx16_decode(blob, 16) == want


def test_hand_authored_uint7_multibyte():
    """uint7 length encoding: 7 bits per byte, high bit = continuation
    (ITF8-style big-endian order per the spec)."""
    payload = bytes([7] * 200)
    blob = bytes([0x20, 0x81, 0x48]) + payload  # 200 = 0x81 0x48 in uint7
    assert native_nx16_decode(blob, 200) == payload


def test_hand_authored_tok3_fixture():
    """Hand-constructed tok3 (name tokeniser) stream, independent of our
    encoder: two names 'read1'/'read2' via DIFF/STRING/DIGITS/MATCH/DELTA
    /END token streams, each rANSNx16-CAT compressed. Pins the container
    framing (0x80 new-position flag, uint7 stream lengths, u32le dists)."""
    lib = _load()

    def cat(raw: bytes) -> bytes:
        assert len(raw) < 128
        return bytes([0x20, len(raw)]) + raw

    def stream(ttype: int, payload: bytes, new_pos: bool) -> bytes:
        c = cat(payload)
        return bytes([ttype | (0x80 if new_pos else 0), len(c)]) + c

    TYPE, STRING, DIGITS, DIFF, DELTA, MATCH, END = 0, 1, 7, 6, 8, 10, 12
    blob = bytearray()
    want = b"read1\x00read2\x00"
    blob += (len(want)).to_bytes(4, "little")  # ulen
    blob += (2).to_bytes(4, "little")          # nnames
    blob += b"\x00"                            # use_arith = 0 (rans)
    # pos 0: TYPE=[DIFF,DIFF]; DIFF dists u32le: 0 (first), 1 (vs name 0)
    blob += stream(TYPE, bytes([DIFF, DIFF]), new_pos=True)
    blob += stream(DIFF, (0).to_bytes(4, "little") + (1).to_bytes(4, "little"),
                   new_pos=False)
    # pos 1: TYPE=[STRING, MATCH]; STRING "read\0"
    blob += stream(TYPE, bytes([STRING, MATCH]), new_pos=True)
    blob += stream(STRING, b"read\x00", new_pos=False)
    # pos 2: TYPE=[DIGITS, DELTA]; DIGITS u32le(1); DELTA +1
    blob += stream(TYPE, bytes([DIGITS, DELTA]), new_pos=True)
    blob += stream(DIGITS, (1).to_bytes(4, "little"), new_pos=False)
    blob += stream(DELTA, bytes([1]), new_pos=False)
    # pos 3: TYPE=[END, END]
    blob += stream(TYPE, bytes([END, END]), new_pos=True)

    out = np.zeros(64, np.uint8)
    n = lib.sio_tok3_decode(bytes(blob), len(blob), len(want), out, len(out))
    assert n == len(want), n
    assert bytes(out[: len(want)]) == want
