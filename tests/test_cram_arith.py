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
