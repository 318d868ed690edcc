"""CRAM 3.0: native C++ reader (io/csrc/cram.cc) vs pure-Python writer.

Two independent implementations of the format: records written as CRAM must
decode identically to the same records written as BAM (the native BAM reader
is already equivalence-tested against the reference semantics). Covers
reference-based features, verbatim bases, embedded reference, AP delta on and
off, multiref slices, detached + downstream mates, CRAI region queries, the
no-coor scan, and the rANS4x8 codec itself.
"""

import os
import random
import subprocess

import numpy as np
import pytest

from strling_tpu.io.bam import Bam, _load
from strling_tpu.io.bamwrite import BamRecord, write_bam
from strling_tpu.io.cramwrite import rans_encode_o0, rans_encode_o1, write_cram
from strling_tpu.io.fasta import build_fai, write_fasta

# ------------------------------------------------------------------- rANS


def native_rans_decode(blob: bytes, out_sz: int) -> bytes:
    lib = _load()
    out = np.zeros(max(out_sz, 1), np.uint8)
    n = lib.sio_rans_decode(blob, len(blob), out, len(out))
    assert n == out_sz, f"rANS decode returned {n}, want {out_sz}"
    return bytes(out[:out_sz])


def rans_cases():
    rng = random.Random(7)
    cases = [
        b"\x00",
        b"\x00" * 100,
        b"a",
        b"ab",
        b"abc",
        b"abcd",
        b"abcde",
        bytes(range(256)) * 3,
        b"ACGTACGTACGT" * 50,
        bytes(rng.randrange(256) for _ in range(10007)),
        bytes(rng.choice(b"ACGTN") for _ in range(4096)),
        bytes(rng.choice(b"\x01\x02") for _ in range(777)),
    ]
    return cases


@pytest.mark.parametrize("i", range(len(rans_cases())))
def test_rans_o0_roundtrip(i):
    data = rans_cases()[i]
    assert native_rans_decode(rans_encode_o0(data), len(data)) == data


@pytest.mark.parametrize("i", range(len(rans_cases())))
def test_rans_o1_roundtrip(i):
    data = rans_cases()[i]
    assert native_rans_decode(rans_encode_o1(data), len(data)) == data


# ------------------------------------------------------------ CRAM fixtures

HEADER = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000\n@SQ\tSN:chr2\tLN:50000\n"
TARGETS = [("chr1", 100000), ("chr2", 50000)]


def make_ref():
    rng = random.Random(42)
    return {
        "chr1": "".join(rng.choice("ACGT") for _ in range(100000)),
        "chr2": "".join(rng.choice("ACGT") for _ in range(50000)),
    }


def make_records(ref):
    """Reads sampled from the reference with mismatches, indels, clips,
    proper pairs (downstream-mate eligible), inconsistent pairs (detached),
    a multi-chrom region and unmapped tail reads."""
    rng = random.Random(1)
    recs = []

    def read_from(chrom, pos, L=100, mismatches=2):
        s = list(ref[chrom][pos:pos + L])
        for _ in range(mismatches):
            k = rng.randrange(L)
            s[k] = rng.choice("ACGT".replace(s[k], ""))
        return "".join(s)

    for i in range(60):
        pos = 1000 + i * 101
        mpos = pos + 250
        seq1 = read_from("chr1", pos)
        seq2 = read_from("chr1", mpos)
        tlen = mpos + 100 - pos
        recs.append(BamRecord(f"p{i}", 99, 0, pos, 60, "100M", 0, mpos, tlen, seq1))
        recs.append(BamRecord(f"p{i}", 147, 0, mpos, 60, "100M", 0, pos, -tlen, seq2))
    # inconsistent isize -> must fall back to detached
    recs.append(BamRecord("d0", 99, 0, 30000, 60, "100M", 0, 30300, 12345,
                          read_from("chr1", 30000)))
    recs.append(BamRecord("d0", 147, 0, 30300, 60, "100M", 0, 30000, -12345,
                          read_from("chr1", 30300)))
    # soft clips, insertion, deletion, skip, hardclip, single-base insert
    recs.append(BamRecord("sc", 0, 0, 40000, 42, "20S60M20S", -1, -1, 0,
                          "T" * 20 + read_from("chr1", 40000, 60, 1) + "G" * 20))
    recs.append(BamRecord("ins", 0, 0, 40100, 42, "40M8I52M", -1, -1, 0,
                          read_from("chr1", 40100, 40, 0) + "AACCGGTT"
                          + read_from("chr1", 40140, 52, 0)))
    recs.append(BamRecord("ins1", 0, 0, 40200, 42, "50M1I49M", -1, -1, 0,
                          read_from("chr1", 40200, 50, 0) + "A"
                          + read_from("chr1", 40250, 49, 0)))
    recs.append(BamRecord("del", 0, 0, 40300, 42, "50M10D50M", -1, -1, 0,
                          read_from("chr1", 40300, 50, 1)
                          + read_from("chr1", 40360, 50, 1)))
    recs.append(BamRecord("skip", 0, 0, 40400, 42, "30M1000N70M", -1, -1, 0,
                          read_from("chr1", 40400, 30, 0)
                          + read_from("chr1", 41430, 70, 0)))
    recs.append(BamRecord("hc", 0, 0, 40500, 42, "5H100M3H", -1, -1, 0,
                          read_from("chr1", 40500, 100, 1)))
    # N bases in the read (substitution to N uses the SM matrix too)
    recs.append(BamRecord("nn", 0, 0, 40600, 9, "100M", -1, -1, 0,
                          "N" * 10 + read_from("chr1", 40610, 90, 0)))
    # chr2 reads (multiref slice when slice_size spans the chrom boundary)
    for i in range(10):
        pos = 500 + i * 333
        recs.append(BamRecord(f"c2_{i}", 0, 1, pos, 33, "100M", -1, -1, 0,
                              read_from("chr2", pos)))
    recs.sort(key=lambda r: (r.tid if r.tid >= 0 else 1 << 30, r.pos))
    # unmapped pair at the end (no-coor block)
    recs.append(BamRecord("u1", 77, -1, -1, 0, "*", -1, -1, 0, "ACAC" * 25))
    recs.append(BamRecord("u1", 141, -1, -1, 0, "*", -1, -1, 0, "GTGT" * 25))
    return recs


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("cram")
    ref = make_ref()
    fa = d / "ref.fa"
    write_fasta(str(fa), ref)
    build_fai(str(fa), str(fa) + ".fai")
    recs = make_records(ref)
    bam = d / "t.bam"
    write_bam(str(bam), HEADER, TARGETS, recs)
    return {"dir": d, "ref": ref, "fa": str(fa), "recs": recs, "bam": str(bam)}


def collect(handle_iter):
    out = []
    for batch in handle_iter:
        for i in range(len(batch)):
            cig = tuple(int(c) for c in batch.cigar_of(i))
            out.append((
                batch.qname(i), int(batch.flag[i]), int(batch.tid[i]),
                int(batch.pos[i]), int(batch.mapq[i]), cig,
                int(batch.mate_tid[i]), int(batch.mate_pos[i]),
                int(batch.isize[i]), batch.seq_str(i),
            ))
    return out


def assert_same_records(bam_path, cram_path, fasta=None):
    b = Bam(bam_path)
    c = Bam(cram_path, fasta=fasta)
    assert c.header_text == b.header_text
    assert [(t.name, t.length) for t in c.targets] == [
        (t.name, t.length) for t in b.targets
    ]
    got = collect(c.batches())
    want = collect(b.batches())
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, f"\ncram: {g}\nbam:  {w}"


def test_ref_based_roundtrip(paths):
    p = str(paths["dir"] / "ref_based.cram")
    write_cram(p, HEADER, TARGETS, paths["recs"], fasta=paths["fa"], slice_size=37)
    assert_same_records(paths["bam"], p, fasta=paths["fa"])


def test_verbatim_roundtrip(paths):
    """No reference at write time ('b' features, RR=false): none at read time."""
    p = str(paths["dir"] / "verbatim.cram")
    write_cram(p, HEADER, TARGETS, paths["recs"], fasta=None, slice_size=64)
    assert_same_records(paths["bam"], p, fasta=None)


def test_embedded_ref_roundtrip(paths):
    """Embedded-reference slices decode without the FASTA."""
    p = str(paths["dir"] / "embed.cram")
    write_cram(p, HEADER, TARGETS, paths["recs"], fasta=paths["ref"],
               slice_size=50, embed_ref=True)
    assert_same_records(paths["bam"], p, fasta=None)


def test_ap_non_delta_roundtrip(paths):
    p = str(paths["dir"] / "nodelta.cram")
    write_cram(p, HEADER, TARGETS, paths["recs"], fasta=paths["ref"],
               slice_size=1000, ap_delta=False)
    assert_same_records(paths["bam"], p, fasta=paths["fa"])


def test_region_query(paths):
    p = str(paths["dir"] / "q.cram")
    write_cram(p, HEADER, TARGETS, paths["recs"], fasta=paths["fa"], slice_size=16)
    b = Bam(paths["bam"])
    c = Bam(p, fasta=paths["fa"])
    assert c.has_index
    for tid, beg, end in [(0, 1500, 2500), (0, 0, 100000), (0, 40310, 40320),
                          (1, 600, 900), (1, 0, 50000), (0, 99000, 100000)]:
        want = collect(b.query(tid, beg, end))
        got = collect(c.query(tid, beg, end))
        assert got == want, (tid, beg, end)


def test_unmapped_query(paths):
    p = str(paths["dir"] / "u.cram")
    write_cram(p, HEADER, TARGETS, paths["recs"], fasta=paths["fa"], slice_size=33)
    b = Bam(paths["bam"])
    c = Bam(p, fasta=paths["fa"])
    want = collect(b.query_unmapped())
    got = collect(c.query_unmapped())
    assert [g[0] for g in got] == ["u1", "u1"]
    assert got == want


def test_extract_cram_equals_bam(paths):
    """End-to-end: the native extract engine produces identical treads from
    CRAM and BAM inputs (extract.nim:275-329 accepts either via htslib)."""
    from strling_tpu.core.extract import extract_native

    p = str(paths["dir"] / "x.cram")
    # STR-rich synthetic reads so extract emits treads
    ref = paths["ref"]
    rng = random.Random(3)
    recs = []
    for i in range(40):
        pos = 2000 + i * 71
        seq = ref["chr1"][pos:pos + 100]
        mpos = pos + 220
        mseq = "ATT" * 34  # STR-saturated mate
        tlen = mpos + 100 - pos
        recs.append(BamRecord(f"s{i}", 99, 0, pos, 60, "100M", 0, mpos, tlen, seq))
        recs.append(BamRecord(f"s{i}", 147, 0, mpos, 3, "100M", 0, pos, -tlen,
                              mseq[:100]))
    recs.sort(key=lambda r: (r.tid, r.pos))
    bam_p = str(paths["dir"] / "x.bam")
    write_bam(bam_p, HEADER, TARGETS, recs)
    write_cram(p, HEADER, TARGETS, recs, fasta=paths["fa"], slice_size=29)

    out = {}
    for name, path in [("bam", bam_p), ("cram", p)]:
        h = Bam(path, fasta=paths["fa"])
        treads, frag, _ = extract_native(h, None, None, proportion_repeat=0.8,
                                         min_mapq=40)
        out[name] = (treads, frag)
    tb, fb = out["bam"]
    tc, fc = out["cram"]
    assert np.array_equal(fb, fc)
    assert len(tb.data) == len(tc.data) > 0
    assert np.array_equal(tb.data, tc.data)
    assert tb.qnames == tc.qnames


FUZZ_READER = """
import sys
sys.path.insert(0, {repo!r})
from strling_tpu.io.bam import Bam
try:
    b = Bam(sys.argv[1], fasta=sys.argv[2] if len(sys.argv) > 2 else None)
    n = sum(len(x) for x in b.batches())
    sys.exit(0)
except (OSError, IOError):
    sys.exit(3)
"""


def test_malformed_cram_fails_cleanly(paths, tmp_path):
    """Truncated / bit-flipped CRAMs must raise, never crash the process."""
    import os
    import subprocess
    import sys as _sys

    p = str(paths["dir"] / "fuzz.cram")
    write_cram(p, HEADER, TARGETS, paths["recs"][:40], fasta=paths["fa"],
               slice_size=16)
    blob = bytearray(open(p, "rb").read())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "rd.py"
    script.write_text(FUZZ_READER.format(repo=repo))
    rng = random.Random(9)
    cases = []
    for frac in (0.1, 0.3, 0.5, 0.7, 0.9, 0.99):
        cases.append(bytes(blob[: int(len(blob) * frac)]))  # truncations
    for _ in range(12):  # bit flips across the container region
        m = bytearray(blob)
        for _ in range(rng.randrange(1, 8)):
            i = rng.randrange(30, len(m))
            m[i] ^= 1 << rng.randrange(8)
        cases.append(bytes(m))
    for i, data in enumerate(cases):
        fp = tmp_path / f"m{i}.cram"
        fp.write_bytes(data)
        r = subprocess.run(
            [_sys.executable, str(script), str(fp), paths["fa"]],
            capture_output=True, timeout=60,
        )
        assert r.returncode in (0, 3), (
            f"case {i}: rc={r.returncode} (crash?)\n{r.stderr.decode()[-500:]}"
        )


def test_random_records_roundtrip(paths):
    """Property test: random flags/cigars/positions round-trip exactly."""
    rng = random.Random(123)
    ref = paths["ref"]
    recs = []
    for i in range(300):
        tid = rng.choice([0, 1])
        chrom = "chr1" if tid == 0 else "chr2"
        pos = rng.randrange(0, len(ref[chrom]) - 400)
        # random cigar: clips around a mix of M/I/D/N ops
        parts = []
        if rng.random() < 0.4:
            parts.append((rng.randrange(1, 30), 4))  # S
        n_mid = rng.randrange(1, 4)
        for j in range(n_mid):
            parts.append((rng.randrange(1, 60), 0))  # M
            if j < n_mid - 1:
                parts.append((rng.randrange(1, 9),
                              rng.choice([1, 2, 3])))  # I/D/N
        if rng.random() < 0.4:
            parts.append((rng.randrange(1, 30), 4))  # S
        if rng.random() < 0.2:
            parts = [(rng.randrange(1, 9), 5)] + parts + [(rng.randrange(1, 9), 5)]  # H
        # build the read sequence consistent with the cigar
        seq = []
        p = pos
        for n, op in parts:
            if op == 0:  # M: ref bases with occasional mismatch
                for k in range(n):
                    b = ref[chrom][p + k] if p + k < len(ref[chrom]) else "N"
                    if rng.random() < 0.1:
                        b = rng.choice("ACGTN")
                    seq.append(b)
                p += n
            elif op == 1:  # I
                seq.extend(rng.choice("ACGT") for _ in range(n))
            elif op in (2, 3):  # D/N
                p += n
            elif op == 4:  # S
                seq.extend(rng.choice("ACGT") for _ in range(n))
        flag = rng.choice([0, 16, 99, 147, 83, 163, 1024, 512])
        recs.append(BamRecord(f"rr{i}", flag, tid, pos,
                              rng.randrange(0, 61), parts,
                              -1, -1, 0, "".join(seq)))
    recs.sort(key=lambda r: (r.tid, r.pos))
    d = paths["dir"]
    bam_p = str(d / "prop.bam")
    cram_p = str(d / "prop.cram")
    write_bam(bam_p, HEADER, TARGETS, recs)
    write_cram(cram_p, HEADER, TARGETS, recs, fasta=paths["fa"], slice_size=41)
    assert_same_records(bam_p, cram_p, fasta=paths["fa"])


def test_core_codec_roundtrip(paths):
    """HUFFMAN / BETA / GAMMA values in the core bit stream decode exactly
    (the default writer uses only EXTERNAL/BYTE_ARRAY encodings)."""
    p = str(paths["dir"] / "core.cram")
    write_cram(p, HEADER, TARGETS, paths["recs"], fasta=paths["fa"],
               slice_size=23, core_codecs=True)
    assert_same_records(paths["bam"], p, fasta=paths["fa"])


def test_read_overhanging_chromosome_end(paths):
    """Reference-based encode/decode of a read mapped past the chromosome
    end (ref bases out of range behave as 'N' on both sides)."""
    ref = paths["ref"]
    end = len(ref["chr1"])
    seq = ref["chr1"][end - 60:] + "ACGT" * 10  # 40bp past the end
    recs = [BamRecord("edge", 0, 0, end - 60, 50, "100M", -1, -1, 0, seq)]
    d = paths["dir"]
    write_bam(str(d / "edge.bam"), HEADER, TARGETS, recs)
    write_cram(str(d / "edge.cram"), HEADER, TARGETS, recs, fasta=paths["fa"])
    assert_same_records(str(d / "edge.bam"), str(d / "edge.cram"),
                        fasta=paths["fa"])


# ------------------------------------------------------- rANS Nx16 (CRAM 3.1)


def native_nx16_decode(blob: bytes, out_sz: int) -> bytes:
    lib = _load()
    out = np.zeros(max(out_sz, 1), np.uint8)
    n = lib.sio_rans_nx16_decode(blob, len(blob), out_sz, out, len(out))
    assert n == out_sz, f"rANSNx16 decode returned {n}, want {out_sz}"
    return bytes(out[:out_sz])


def nx16_cases():
    rng = random.Random(31)
    return [
        b"",
        b"\x00",
        b"a",
        b"abc",
        b"\x00" * 1000,                                   # single symbol
        b"ACGTACGTACGT" * 100,                            # tiny alphabet
        bytes(range(256)) * 5,                            # full alphabet
        bytes(rng.randrange(256) for _ in range(10007)),  # incompressible
        bytes(rng.choice(b"ACGTN") for _ in range(4097)), # seq-like, odd len
        bytes(rng.choice(b"!#$%&'()*+,-.") for _ in range(3000)),  # qual-like
        b"AAAAABBBCCCCCCCCD" * 200,                       # heavy runs
        bytes(rng.choice(b"\x00\x01") for _ in range(777)),
    ]


NX16_CONFIGS = [
    dict(order=0),
    dict(order=1),
    dict(order=0, N=32),
    dict(order=1, N=32),
    dict(order=0, nosz=True),
    dict(order=1, comp_freqs=True),
    dict(cat=True),
    dict(order=0, rle=True),
    dict(order=1, rle=True, comp_rle_meta=True),
    dict(order=0, stripe=4),
    dict(order=1, stripe=3),
]


@pytest.mark.parametrize("ci", range(len(NX16_CONFIGS)))
@pytest.mark.parametrize("di", range(len(nx16_cases())))
def test_nx16_roundtrip(ci, di):
    from strling_tpu.io.cramwrite import nx16_encode

    data = nx16_cases()[di]
    cfg = NX16_CONFIGS[ci]
    blob = nx16_encode(data, **cfg)
    assert native_nx16_decode(blob, len(data)) == data


@pytest.mark.parametrize("di", range(len(nx16_cases())))
def test_nx16_pack_roundtrip(di):
    from strling_tpu.io.cramwrite import nx16_encode

    data = nx16_cases()[di]
    if len(set(data)) > 16:
        pytest.skip("pack needs <=16 distinct symbols")
    for cfg in (dict(order=0, pack=True), dict(order=1, pack=True),
                dict(order=0, pack=True, rle=True)):
        blob = nx16_encode(data, **cfg)
        assert native_nx16_decode(blob, len(data)) == data


def test_nx16_fuzz_no_crash():
    """Bit-flipped and truncated Nx16 streams must fail cleanly or produce
    output of the right size -- never crash."""
    from strling_tpu.io.cramwrite import nx16_encode

    rng = random.Random(99)
    data = bytes(rng.choice(b"ACGT") for _ in range(2000))
    lib = _load()
    for cfg in NX16_CONFIGS:
        blob = bytearray(nx16_encode(data, **cfg))
        for _ in range(200):
            mutated = bytearray(blob)
            k = rng.randrange(len(mutated))
            mutated[k] ^= 1 << rng.randrange(8)
            cut = rng.randrange(len(mutated) + 1)
            for trial in (bytes(mutated), bytes(blob[:cut])):
                out = np.zeros(len(data) + 1, np.uint8)
                lib.sio_rans_nx16_decode(trial, len(trial), len(data),
                                         out, len(out))


def test_cram31_roundtrip(paths):
    """CRAM 3.1 file (rANSNx16-compressed external blocks) decodes to the
    same records as the BAM."""
    p = str(paths["dir"] / "v31.cram")
    write_cram(p, HEADER, TARGETS, paths["recs"], fasta=paths["fa"],
               slice_size=43, v31=True)
    with open(p, "rb") as f:
        assert f.read(6) == b"CRAM\x03\x01"
    assert_same_records(paths["bam"], p, fasta=paths["fa"])


# ------------------------------------------------------ name tokeniser (3.1)


def tok3_name_cases():
    rng = random.Random(17)
    illumina = [f"A00111:74:H12JKDSXX:1:{l}:{x}:{y}"
                for l in range(1101, 1109)
                for x, y in [(rng.randrange(40000), rng.randrange(40000))]]
    sra = [f"SRR1301923.{i}" for i in range(1, 40)]
    padded = [f"read{i:06d}/1" for i in range(990, 1030)]
    weird = ["a", "1", "0", "x" * 300, "007", "n-1_2.3#4",
             "q" + "9" * 12, "", "dup", "dup", "dup"]
    mixed = []
    for i in range(200):
        mixed.append(rng.choice([
            f"m{i}", f"m{i:04d}", f"pair:{i}:{i*7}", "same", str(2**31 + i)]))
    return [illumina, sra, padded, weird, mixed, [], ["solo"]]


def native_tok3_decode(blob: bytes, out_sz: int) -> bytes:
    lib = _load()
    out = np.zeros(max(out_sz, 1), np.uint8)
    n = lib.sio_tok3_decode(blob, len(blob), out_sz, out, len(out))
    assert n == out_sz, f"tok3 decode returned {n}, want {out_sz}"
    return bytes(out[:out_sz])


@pytest.mark.parametrize("i", range(len(tok3_name_cases())))
def test_tok3_roundtrip(i):
    from strling_tpu.io.cramwrite import tok3_encode

    names = tok3_name_cases()[i]
    blob = b"".join(n.encode() + b"\x00" for n in names)
    enc = tok3_encode(blob)
    assert native_tok3_decode(enc, len(blob)) == blob


def test_tok3_fuzz_no_crash():
    from strling_tpu.io.cramwrite import tok3_encode

    rng = random.Random(4)
    names = [f"A1:2:{i}:{i*3}" for i in range(500)]
    blob = b"".join(n.encode() + b"\x00" for n in names)
    enc = bytearray(tok3_encode(blob))
    lib = _load()
    for _ in range(300):
        mutated = bytearray(enc)
        k = rng.randrange(len(mutated))
        mutated[k] ^= 1 << rng.randrange(8)
        cut = rng.randrange(len(mutated) + 1)
        for trial in (bytes(mutated), bytes(enc[:cut])):
            out = np.zeros(len(blob) + 1, np.uint8)
            lib.sio_tok3_decode(trial, len(trial), len(blob), out, len(out))


# ------------------------------------------- required-fields decode skipping


def test_stored_qualities_skip_equivalence(paths, tmp_path):
    """CRAMs with stored quality scores (cf&0x1, QS series) must decode to
    identical records whether the QS blocks are skipped (default,
    CRAM_OPT_REQUIRED_FIELDS equivalent) or fully decoded
    (STRLING_CRAM_DECODE_ALL=1 in a subprocess, since the switch is read
    once)."""
    rng = random.Random(9)
    recs = []
    for r in paths["recs"]:
        r2 = BamRecord(r.qname, r.flag, r.tid, r.pos, r.mapq,
                       list(r.cigar), r.mate_tid, r.mate_pos, r.isize, r.seq,
                       qual=bytes(rng.randrange(0, 42) for _ in r.seq))
        recs.append(r2)
    p = tmp_path / "qual.cram"
    write_cram(str(p), HEADER, TARGETS, recs, fasta=paths["fa"])
    # default mode (skipping active): records equal the BAM
    assert_same_records(paths["bam"], str(p), fasta=paths["fa"])

    # decode-all mode in a subprocess must yield the same flat record dump
    script = tmp_path / "dump.py"
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
    import sys as _sys2

    env_skip = dict(os.environ)
    env_skip.pop("STRLING_CRAM_DECODE_ALL", None)
    env_full = dict(env_skip, STRLING_CRAM_DECODE_ALL="1")
    outs = []
    for env in (env_skip, env_full):
        r = subprocess.run(
            [_sys2.executable, str(script), str(p), paths["fa"]],
            capture_output=True, timeout=120, env=env,
        )
        assert r.returncode == 0, r.stderr.decode()[-800:]
        outs.append(r.stdout.strip())
    assert outs[0] == outs[1]


def test_bzip2_lzma_roundtrip(paths):
    """CRAM block methods 2 (bzip2) and 3 (lzma/.xz): blocks compressed by
    the Python stdlib (independent implementations) must decode through the
    native bz2/xz decoders. htslib writes such files with
    --output-fmt-option use_bzip2/use_lzma (strling.nimble:20 ships the
    full htslib codec set)."""
    p = str(paths["dir"] / "bzlz.cram")
    write_cram(p, HEADER, TARGETS, paths["recs"], fasta=paths["fa"],
               slice_size=41, bz_lzma=True)
    # the file really uses methods 2 and 3
    blob = open(p, "rb").read()
    from strling_tpu.io.cramwrite import itf8
    import bz2 as _bz2

    probe = _bz2.compress(b"x")[:3]
    assert probe[:2] == b"BZ" and blob.count(b"BZh9") > 0
    assert blob.count(b"\xfd7zXZ\x00") > 0  # xz stream magic
    assert_same_records(paths["bam"], p, fasta=paths["fa"])


def test_bzip2_lzma_corrupt_blocks_rejected(paths, tmp_path):
    """Bit-flipped bzip2/lzma payloads must fail cleanly, not crash."""
    p = str(tmp_path / "bzlz_bad.cram")
    write_cram(p, HEADER, TARGETS, paths["recs"], fasta=paths["fa"],
               slice_size=1000, bz_lzma=True)
    blob = bytearray(open(p, "rb").read())
    i = blob.find(b"BZh9")
    assert i > 0
    blob[i + 10] ^= 0xFF
    bad = str(tmp_path / "flip.cram")
    open(bad, "wb").write(bytes(blob))
    import pytest as _pytest

    with _pytest.raises(Exception):
        c = Bam(bad, fasta=paths["fa"])
        collect(c.batches())
