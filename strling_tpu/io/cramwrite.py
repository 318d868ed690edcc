"""Pure-Python CRAM 3.0 writer (+ .crai index) and rANS4x8 codec.

Used by tests and as a fixture generator: the environment has no
samtools/htslib, so this is a second, independent implementation of the
format that the native C++ reader (io/csrc/cram.cc) is validated against.
Writes spec-compliant CRAM 3.0:

- per-record features (X/S/I/i/D/N/H/P against a reference FASTA, or
  verbatim 'b' base stretches when no reference is given, with RR=false)
- detached mates and same-slice downstream-mate links (NF), choosing
  downstream only when the spec's mate-reconstruction rules reproduce the
  original fields exactly
- external blocks compressed with gzip and rANS4x8 (orders 0 and 1)

Round-trip caveat: CIGAR '='/'X' ops decode as 'M' (like htslib).
"""

from __future__ import annotations

import gzip as _gzip
import struct
import zlib

from strling_tpu.io.bamwrite import BamRecord, ref_span

CIGAR_OPS = "MIDNSHP=X"

# ------------------------------------------------------------------ varints


def itf8(v: int) -> bytes:
    v &= 0xFFFFFFFF
    if v < 0x80:
        return bytes([v])
    if v < 0x4000:
        return bytes([0x80 | (v >> 8), v & 0xFF])
    if v < 0x200000:
        return bytes([0xC0 | (v >> 16), (v >> 8) & 0xFF, v & 0xFF])
    if v < 0x10000000:
        return bytes([0xE0 | (v >> 24), (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF])
    return bytes([
        0xF0 | (v >> 28), (v >> 20) & 0xFF, (v >> 12) & 0xFF, (v >> 4) & 0xFF,
        v & 0x0F,
    ])


def ltf8(v: int) -> bytes:
    v &= 0xFFFFFFFFFFFFFFFF
    if v < 0x80:
        return bytes([v])
    for extra, bits, prefix in (
        (1, 6, 0x80), (2, 5, 0xC0), (3, 4, 0xE0), (4, 3, 0xF0),
        (5, 2, 0xF8), (6, 1, 0xFC),
    ):
        if v < (1 << (bits + 8 * extra)):
            b = [prefix | (v >> (8 * extra))]
            for i in range(extra - 1, -1, -1):
                b.append((v >> (8 * i)) & 0xFF)
            return bytes(b)
    if v < (1 << 56):
        return bytes([0xFE]) + v.to_bytes(7, "big")
    return bytes([0xFF]) + v.to_bytes(8, "big")


# -------------------------------------------------------------- rANS 4x8

RANS_LOW = 1 << 23
TF_SHIFT = 12
TOTFREQ = 1 << TF_SHIFT


def _norm_freqs(F: list[int]) -> list[int]:
    """Scale a 256-bin histogram so nonzero bins stay nonzero and sum=4096."""
    tot = sum(F)
    Fn = [0] * 256
    for s in range(256):
        if F[s]:
            Fn[s] = max(1, F[s] * TOTFREQ // tot)
    diff = TOTFREQ - sum(Fn)
    order = sorted((s for s in range(256) if Fn[s]), key=lambda s: -Fn[s])
    i = 0
    while diff != 0:
        s = order[i % len(order)]
        step = 1 if diff > 0 else -1
        if Fn[s] + step >= 1:
            Fn[s] += step
            diff -= step
        i += 1
    return Fn


def _write_freqs(Fn: list[int]) -> bytes:
    """The RLE frequency-table serialization (htslib rans_static layout)."""
    out = bytearray()
    rle = 0
    for j in range(256):
        if not Fn[j]:
            continue
        if rle:
            rle -= 1
        else:
            out.append(j)
            if j > 0 and Fn[j - 1]:
                # start of a consecutive run: emit its length
                run = 0
                k = j + 1
                while k < 256 and Fn[k]:
                    run += 1
                    k += 1
                out.append(run)
                rle = run
        f = Fn[j]
        if f < 128:
            out.append(f)
        else:
            out.append(0x80 | (f >> 8))
            out.append(f & 0xFF)
    out.append(0)
    return bytes(out)


class _Enc:
    """One rANS state emitting into a shared reverse buffer."""

    __slots__ = ("x",)

    def __init__(self):
        self.x = RANS_LOW

    def put(self, buf: bytearray, f: int, c: int):
        x = self.x
        x_max = ((RANS_LOW >> TF_SHIFT) << 8) * f
        while x >= x_max:
            buf.append(x & 0xFF)
            x >>= 8
        self.x = ((x // f) << TF_SHIFT) + (x % f) + c

    def flush(self, buf: bytearray):
        # forward stream holds the 4 state bytes little-endian
        x = self.x
        buf.append((x >> 24) & 0xFF)
        buf.append((x >> 16) & 0xFF)
        buf.append((x >> 8) & 0xFF)
        buf.append(x & 0xFF)


def rans_encode_o0(data: bytes) -> bytes:
    assert data
    F = [0] * 256
    for b in data:
        F[b] += 1
    Fn = _norm_freqs(F)
    C = [0] * 257
    for s in range(256):
        C[s + 1] = C[s] + Fn[s]
    table = _write_freqs(Fn)
    buf = bytearray()  # reverse stream
    R = [_Enc() for _ in range(4)]
    n = len(data)
    rem = n & 3
    for k in range(rem, 0, -1):
        s = data[n - rem + k - 1]
        R[k].put(buf, Fn[s], C[s])
    for i in range(n & ~3, 0, -4):
        R[3].put(buf, Fn[data[i - 1]], C[data[i - 1]])
        R[2].put(buf, Fn[data[i - 2]], C[data[i - 2]])
        R[1].put(buf, Fn[data[i - 3]], C[data[i - 3]])
        R[0].put(buf, Fn[data[i - 4]], C[data[i - 4]])
    for k in (3, 2, 1, 0):
        R[k].flush(buf)
    payload = table + bytes(reversed(buf))
    return bytes([0]) + struct.pack("<II", len(payload), n) + payload


def rans_encode_o1(data: bytes) -> bytes:
    assert data
    n = len(data)
    isz4 = n >> 2
    F = [[0] * 256 for _ in range(256)]
    # context 0 starts each of the four interleaved streams
    for k in range(4):
        lo = k * isz4
        hi = (k + 1) * isz4 if k < 3 else n
        if lo >= hi:
            continue
        F[0][data[lo]] += 1
        for j in range(lo + 1, hi):
            F[data[j - 1]][data[j]] += 1
    Fn = [None] * 256
    C = [None] * 256
    for i in range(256):
        if sum(F[i]) == 0:
            continue
        Fn[i] = _norm_freqs(F[i])
        cc = [0] * 257
        for s in range(256):
            cc[s + 1] = cc[s] + Fn[i][s]
        C[i] = cc
    # serialize tables: outer RLE over contexts, inner O0 layout
    table = bytearray()
    rle_i = 0
    for i in range(256):
        if Fn[i] is None:
            continue
        if rle_i:
            rle_i -= 1
        else:
            table.append(i)
            if i > 0 and Fn[i - 1] is not None:
                run = 0
                k = i + 1
                while k < 256 and Fn[k] is not None:
                    run += 1
                    k += 1
                table.append(run)
                rle_i = run
        table += _write_freqs(Fn[i])
    table.append(0)

    # Interleaved states share one byte stream: push symbols in the exact
    # reverse of the decoder's read order (remainder via state 3 last; main
    # loop reads k=0..3 at each position).
    buf = bytearray()
    R = [_Enc() for _ in range(4)]
    for j in range(n - 1, 4 * isz4 - 1, -1):  # remainder, reversed
        s = data[j]
        ctx = data[j - 1] if j > 0 else 0
        R[3].put(buf, Fn[ctx][s], C[ctx][s])
    for j in range(isz4 - 1, -1, -1):
        for k in (3, 2, 1, 0):
            idx = k * isz4 + j
            s = data[idx]
            ctx = data[idx - 1] if j > 0 else 0
            R[k].put(buf, Fn[ctx][s], C[ctx][s])
    for k in (3, 2, 1, 0):
        R[k].flush(buf)
    payload = bytes(table) + bytes(reversed(buf))
    return bytes([1]) + struct.pack("<II", len(payload), n) + payload


# ---------------------------------------------------------- rANS Nx16 (3.1)
# Independent encoder for the CRAM 3.1 rANSNx16 codec (block method 5):
# 16-bit-renormalised rANS, 4- or 32-way interleave, optional bit-pack / RLE /
# stripe / cat transforms and compressed order-1 frequency tables. Exists to
# round-trip-test the native decoder (io/csrc/cram.cc) against a second
# implementation, mirroring the rans4x8 encoder above.

NX16_LOW = 1 << 15
NX16_ORDER1 = 1
NX16_X32 = 4
NX16_STRIPE = 8
NX16_NOSZ = 16
NX16_CAT = 32
NX16_RLE = 64
NX16_PACK = 128


def _uint7(v: int) -> bytes:
    """Big-endian base-128 varint (continuation in the high bit)."""
    out = bytearray([v & 0x7F])
    v >>= 7
    while v:
        out.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(reversed(out))


def _nx16_norm(F: list[int], bits: int) -> list[int]:
    """Normalize a 256-bin histogram to sum exactly 1<<bits, zeros preserved."""
    tot = sum(F)
    want = 1 << bits
    Fn = [0] * 256
    for s in range(256):
        if F[s]:
            Fn[s] = max(1, F[s] * want // tot)
    diff = want - sum(Fn)
    order = sorted((s for s in range(256) if Fn[s]), key=lambda s: -Fn[s])
    i = 0
    while diff != 0:
        s = order[i % len(order)]
        step = 1 if diff > 0 else -1
        if Fn[s] + step >= 1:
            Fn[s] += step
            diff -= step
        i += 1
    return Fn


def _nx16_alphabet(syms: list[int]) -> bytes:
    """Ascending symbol list with consecutive-run compression, 0-terminated."""
    out = bytearray([syms[0]])
    last = syms[0]
    i = 1
    while i < len(syms):
        s = syms[i]
        out.append(s)
        if s == last + 1:
            run = 0
            while i + 1 + run < len(syms) and syms[i + 1 + run] == s + 1 + run:
                run += 1
            out.append(run)
            last = s + run
            i += 1 + run
        else:
            last = s
            i += 1
    out.append(0)
    return bytes(out)


class _Enc16:
    """One rANS state with 16-bit renormalisation (shared reverse buffer)."""

    __slots__ = ("x",)

    def __init__(self):
        self.x = NX16_LOW

    def put(self, buf: bytearray, f: int, c: int, shift: int):
        x = self.x
        x_max = ((NX16_LOW >> shift) << 16) * f
        while x >= x_max:
            buf.append((x >> 8) & 0xFF)  # reversed later → little-endian u16
            buf.append(x & 0xFF)
            x >>= 16
        self.x = ((x // f) << shift) + (x % f) + c

    def flush(self, buf: bytearray):
        x = self.x
        for sh in (24, 16, 8, 0):
            buf.append((x >> sh) & 0xFF)


def _nx16_o0_bare(data: bytes, N: int) -> bytes:
    """Bare order-0 stream: freq table + rANS payload (no flags/size)."""
    F = [0] * 256
    for c in data:
        F[c] += 1
    Fn = _nx16_norm(F, 12)
    C = [0] * 257
    for s in range(256):
        C[s + 1] = C[s] + Fn[s]
    syms = [s for s in range(256) if Fn[s]]
    table = _nx16_alphabet(syms) + b"".join(_uint7(Fn[s]) for s in syms)
    buf = bytearray()
    R = [_Enc16() for _ in range(N)]
    for i in range(len(data) - 1, -1, -1):  # reverse of decode order
        s = data[i]
        R[i % N].put(buf, Fn[s], C[s], 12)
    for j in range(N - 1, -1, -1):
        R[j].flush(buf)
    return table + bytes(reversed(buf))


def _nx16_o1_bare(data: bytes, N: int, comp_freqs: bool = False) -> bytes:
    """Bare order-1 stream: output split into N contiguous fragments, state j
    decoding fragment j from context 0; state N-1 also decodes the tail."""
    n = len(data)
    L = n // N
    # (state, position) pairs in decoder consumption order
    order = [(j, j * L + i) for i in range(L) for j in range(N)]
    order += [(N - 1, p) for p in range(N * L, n)]

    def ctx_of(j: int, p: int) -> int:
        return 0 if p == j * L else data[p - 1]

    F = [[0] * 256 for _ in range(256)]
    for j, p in order:
        F[ctx_of(j, p)][data[p]] += 1
    shift = 12
    A = sorted({0} | set(data))
    Fn = [None] * 256
    C = [None] * 256
    for i in A:
        if sum(F[i]) == 0:
            continue  # in the alphabet but never used as context
        Fn[i] = _nx16_norm(F[i], shift)
        cc = [0] * 257
        for s in range(256):
            cc[s + 1] = cc[s] + Fn[i][s]
        C[i] = cc
    # serialize: shared alphabet, then one freq row per alphabet symbol with
    # zero-run compression (a 0 freq is followed by a run count).
    table = bytearray(_nx16_alphabet(A))
    for i in A:
        row = Fn[i] if Fn[i] is not None else [0] * 256
        jj = 0
        while jj < len(A):
            f = row[A[jj]]
            table += _uint7(f)
            if f == 0:
                run = 0
                while (jj + 1 + run < len(A) and row[A[jj + 1 + run]] == 0
                       and run < 255):
                    run += 1
                table.append(run)
                jj += 1 + run
            else:
                jj += 1
    if comp_freqs:
        ctab = _nx16_o0_bare(bytes(table), 4)
        head = bytes([(shift << 4) | 1]) + _uint7(len(table)) + \
            _uint7(len(ctab)) + ctab
    else:
        head = bytes([shift << 4]) + bytes(table)
    buf = bytearray()
    R = [_Enc16() for _ in range(N)]
    for j, p in reversed(order):
        s = data[p]
        c = ctx_of(j, p)
        R[j].put(buf, Fn[c][s], C[c][s], shift)
    for j in range(N - 1, -1, -1):
        R[j].flush(buf)
    return head + bytes(reversed(buf))


def nx16_encode(data: bytes, order: int = 0, N: int = 4, pack: bool = False,
                rle: bool = False, cat: bool = False, stripe: int = 0,
                nosz: bool = False, comp_freqs: bool = False,
                comp_rle_meta: bool = False) -> bytes:
    """Full rANSNx16 stream (the bytes of one CRAM block payload)."""
    flags = 0
    if order:
        flags |= NX16_ORDER1
    if N == 32:
        flags |= NX16_X32
    if nosz:
        flags |= NX16_NOSZ
    if stripe:
        out = bytearray([flags | NX16_STRIPE])
        if not nosz:
            out += _uint7(len(data))
        subs = [nx16_encode(bytes(data[j::stripe]), order=order, N=N,
                            nosz=False) for j in range(stripe)]
        out.append(stripe)
        for s in subs:
            out += _uint7(len(s))
        for s in subs:
            out += s
        return bytes(out)

    out = bytearray()
    cur = bytes(data)
    pack_meta = b""
    if pack:
        syms = sorted(set(cur))
        assert len(syms) <= 16, "pack needs <=16 distinct symbols"
        flags |= NX16_PACK
        pack_meta = bytes([len(syms)]) + bytes(syms)
        if len(syms) <= 1:
            cur = b""
        else:
            bits = 1 if len(syms) <= 2 else 2 if len(syms) <= 4 else 4
            per = 8 // bits
            idx = {s: k for k, s in enumerate(syms)}
            packed = bytearray((len(cur) + per - 1) // per)
            for i, c in enumerate(cur):
                packed[i // per] |= idx[c] << (bits * (i % per))
            cur = bytes(packed)
        pack_meta += _uint7(len(cur))
    rle_meta = b""
    if rle:
        flags |= NX16_RLE
        run_syms = sorted({cur[i] for i in range(1, len(cur))
                           if cur[i] == cur[i - 1]})
        if not run_syms:
            run_syms = [cur[0] if cur else 0]  # count byte 0 would mean 256
        has_run = set(run_syms)
        meta = bytearray([0 if len(run_syms) == 256 else len(run_syms)])
        meta += bytes(run_syms)
        lits = bytearray()
        i = 0
        while i < len(cur):
            s = cur[i]
            lits.append(s)
            i += 1
            if s in has_run:
                run = 0
                while i + run < len(cur) and cur[i + run] == s:
                    run += 1
                meta += _uint7(run)
                i += run
        rle_total = len(cur)
        cur = bytes(lits)
        if comp_rle_meta:
            cmeta = _nx16_o0_bare(bytes(meta), 4)
            rle_meta = _uint7(2 * len(meta)) + _uint7(len(cur)) + \
                _uint7(len(cmeta)) + cmeta
        else:
            rle_meta = _uint7(2 * len(meta) + 1) + _uint7(len(cur)) + \
                bytes(meta)
        del rle_total
    if cat or not cur:
        flags |= NX16_CAT
        body = cur
    elif order:
        body = _nx16_o1_bare(cur, N, comp_freqs)
    else:
        body = _nx16_o0_bare(cur, N)
    out.append(flags)
    if not nosz:
        out += _uint7(len(data))
    out += pack_meta
    out += rle_meta
    out += body
    return bytes(out)


# ------------------------------------------------------ name tokeniser (3.1)
# Independent encoder for the CRAM 3.1 name tokeniser ("tok3", block method
# 8), to round-trip-test the native decoder. Token streams are compressed
# with rANSNx16 or (use_arith=1) the adaptive arithmetic coder below.

(TOK_TYPE, TOK_STRING, TOK_CHAR, TOK_DIGITS0, TOK_DZLEN, TOK_DUP, TOK_DIFF,
 TOK_DIGITS, TOK_DELTA, TOK_DELTA0, TOK_MATCH, TOK_NOP, TOK_END) = range(13)


def _tok_split(name: str) -> list[tuple[str, str]]:
    """Split a read name into (kind, text) tokens: d=digits, d0=zero-padded
    digits, s=alpha string, c=single other char."""
    toks = []
    i = 0
    while i < len(name):
        c = name[i]
        if c.isdigit():
            j = i
            while j < len(name) and name[j].isdigit():
                j += 1
            s = name[i:j]
            if len(s) <= 9 and s[0] != "0":
                toks.append(("d", s))
            elif len(s) <= 9:
                toks.append(("d0", s))
            else:
                toks.append(("s", s))
            i = j
        elif c.isalpha():
            j = i
            while j < len(name) and name[j].isalpha():
                j += 1
            toks.append(("s", name[i:j]))
            i = j
        else:
            toks.append(("c", c))
            i += 1
    return toks


def tok3_encode(blob: bytes, use_arith: bool = False) -> bytes:
    """Encode a NUL-separated name blob (the RN block content) as tok3.
    Token streams are rANSNx16-compressed, or arithmetic-coded when
    use_arith is set."""
    assert blob.endswith(b"\x00") or not blob
    names = blob.decode().split("\x00")[:-1] if blob else []
    streams: dict[tuple[int, int], bytearray] = {}

    def S(pos: int, typ: int) -> bytearray:
        return streams.setdefault((pos, typ), bytearray())

    toks_list: list[list[tuple[str, str]]] = []
    for i, name in enumerate(names):
        if i > 0 and names[i - 1] == name:
            S(0, TOK_TYPE).append(TOK_DUP)
            S(0, TOK_DUP).extend(struct.pack("<I", 1))
            toks_list.append(toks_list[i - 1])
            continue
        S(0, TOK_TYPE).append(TOK_DIFF)
        S(0, TOK_DIFF).extend(struct.pack("<I", 1 if i > 0 else 0))
        toks = _tok_split(name)
        ref = toks_list[i - 1] if i > 0 else []
        for pos, (kind, text) in enumerate(toks, start=1):
            rt = ref[pos - 1] if pos - 1 < len(ref) else None
            if rt == (kind, text):
                S(pos, TOK_TYPE).append(TOK_MATCH)
                continue
            if rt is not None and kind in ("d", "d0") and rt[0] == kind \
                    and (kind == "d" or len(text) == len(rt[1])):
                delta = int(text) - int(rt[1])
                if 0 <= delta <= 255:
                    typ = TOK_DELTA if kind == "d" else TOK_DELTA0
                    S(pos, TOK_TYPE).append(typ)
                    S(pos, typ).append(delta)
                    continue
            if kind == "d":
                S(pos, TOK_TYPE).append(TOK_DIGITS)
                S(pos, TOK_DIGITS).extend(struct.pack("<I", int(text)))
            elif kind == "d0":
                S(pos, TOK_TYPE).append(TOK_DIGITS0)
                S(pos, TOK_DIGITS0).extend(struct.pack("<I", int(text)))
                S(pos, TOK_DZLEN).append(len(text))
            elif kind == "c":
                S(pos, TOK_TYPE).append(TOK_CHAR)
                S(pos, TOK_CHAR).extend(text.encode())
            else:
                S(pos, TOK_TYPE).append(TOK_STRING)
                S(pos, TOK_STRING).extend(text.encode() + b"\x00")
        S(len(toks) + 1, TOK_TYPE).append(TOK_END)
        toks_list.append(toks)

    out = bytearray(struct.pack("<II", len(blob), len(names)))
    out.append(1 if use_arith else 0)
    max_pos = max((p for p, _ in streams), default=-1)
    emitted: dict[bytes, tuple[int, int]] = {}
    for pos in range(max_pos + 1):
        first = True
        for typ in range(13):
            if (pos, typ) not in streams:
                continue
            data = bytes(streams[(pos, typ)])
            flag = typ | (0x80 if first else 0)
            first = False
            prior = emitted.get(data)
            if prior is not None and prior[0] <= 255:
                out.append(flag | 0x40)  # duplicate-stream reference
                out.append(prior[0])
                out.append(prior[1])
                continue
            emitted.setdefault(data, (pos, typ))
            comp = (arith_encode(data, order=0) if use_arith
                    else nx16_encode(data, order=0))
            out.append(flag)
            out += _uint7(len(comp)) + comp
    return bytes(out)


# ------------------------------------------- adaptive range coder (3.1)
# Encoder halves of the CRAM 3.1 adaptive arithmetic codec (block method 6)
# and the fqzcomp quality codec (method 7); the native decoders live in
# csrc/cram.cc. Carry-aware LZMA-style range encoder (32-bit range, 2^24
# renorm, cache/0xFF-chain carry propagation, leading cache dummy byte) and
# a move-up-one adaptive model with +16 steps renormalised at 2^16-16 —
# mirrored operation-for-operation with the C++ decode path.

AMODEL_STEP = 16
AMODEL_MAX = (1 << 16) - AMODEL_STEP
ARITH_EXT = NX16_X32  # flag bit 2 = "external" sub-codec in method 6


class _RangeEnc:
    __slots__ = ("low", "range", "cache", "ffnum", "out")

    def __init__(self):
        self.low = 0
        self.range = 0xFFFFFFFF
        self.cache = 0
        self.ffnum = 0
        self.out = bytearray()

    def _shift_low(self):
        carry = self.low >> 32
        if (self.low & 0xFFFFFFFF) < 0xFF000000 or carry:
            self.out.append((self.cache + carry) & 0xFF)
            while self.ffnum:
                self.out.append((0xFF + carry) & 0xFF)
                self.ffnum -= 1
            self.cache = (self.low >> 24) & 0xFF
        else:
            self.ffnum += 1
        self.low = (self.low << 8) & 0xFFFFFFFF

    def encode(self, cum: int, freq: int, tot: int):
        r = self.range // tot
        self.low += cum * r
        self.range = r * freq
        while self.range < (1 << 24):
            self.range <<= 8
            self._shift_low()

    def finish(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


class _AModel:
    """Adaptive model; symbol slots bubble up one place when their frequency
    passes the slot above (same update order as the decoder)."""

    __slots__ = ("freq", "sym", "slot", "total", "nsym")

    def __init__(self, n: int):
        self.nsym = n
        self.freq = [1] * n
        self.sym = list(range(n))
        self.slot = list(range(n))  # symbol -> slot index
        self.total = n

    def encode(self, rc: _RangeEnc, s: int):
        x = self.slot[s]
        acc = 0
        for i in range(x):
            acc += self.freq[i]
        rc.encode(acc, self.freq[x], self.total)
        self.freq[x] += AMODEL_STEP
        self.total += AMODEL_STEP
        if x > 0 and self.freq[x] > self.freq[x - 1]:
            other = self.sym[x - 1]
            self.freq[x], self.freq[x - 1] = self.freq[x - 1], self.freq[x]
            self.sym[x], self.sym[x - 1] = self.sym[x - 1], self.sym[x]
            self.slot[s] = x - 1
            self.slot[other] = x
        if self.total > AMODEL_MAX:
            self.total = 0
            for i in range(self.nsym):
                self.freq[i] -= self.freq[i] >> 1
                self.total += self.freq[i]


def _arith_put_run(rc: _RangeEnc, first: _AModel, cont: _AModel, run: int):
    v = min(run, 255)
    first.encode(rc, v)
    run -= v
    while v == 255:
        v = min(run, 255)
        cont.encode(rc, v)
        run -= v


def arith_encode(data: bytes, order: int = 0, rle: bool = False,
                 pack: bool = False, cat: bool = False, stripe: int = 0,
                 nosz: bool = False) -> bytes:
    """Full method-6 stream (one CRAM block payload). Container flags match
    rANSNx16; the entropy stage is the adaptive coder."""
    flags = 0
    if order:
        flags |= NX16_ORDER1
    if nosz:
        flags |= NX16_NOSZ
    if stripe:
        out = bytearray([flags | NX16_STRIPE])
        if not nosz:
            out += _uint7(len(data))
        subs = [arith_encode(bytes(data[j::stripe]), order=order)
                for j in range(stripe)]
        out.append(stripe)
        for s in subs:
            out += _uint7(len(s))
        for s in subs:
            out += s
        return bytes(out)

    out = bytearray()
    cur = bytes(data)
    pack_meta = b""
    if pack:
        syms = sorted(set(cur))
        assert len(syms) <= 16, "pack needs <=16 distinct symbols"
        flags |= NX16_PACK
        pack_meta = bytes([len(syms)]) + bytes(syms)
        if len(syms) <= 1:
            cur = b""
        else:
            bits = 1 if len(syms) <= 2 else 2 if len(syms) <= 4 else 4
            per = 8 // bits
            idx = {s: k for k, s in enumerate(syms)}
            packed = bytearray((len(cur) + per - 1) // per)
            for i, c in enumerate(cur):
                packed[i // per] |= idx[c] << (bits * (i % per))
            cur = bytes(packed)
        pack_meta += _uint7(len(cur))
    if cat or not cur:
        flags |= NX16_CAT
        body = cur
    else:
        max_sym = max(cur) + 1
        rc = _RangeEnc()
        lits = [_AModel(max_sym) for _ in range(256 if order else 1)]
        if rle:
            flags |= NX16_RLE
            runs = [_AModel(256) for _ in range(256)]
            cont = _AModel(256)
            i = 0
            last = 0
            while i < len(cur):
                s = cur[i]
                run = 0
                while i + 1 + run < len(cur) and cur[i + 1 + run] == s:
                    run += 1
                lits[last if order else 0].encode(rc, s)
                _arith_put_run(rc, runs[s], cont, run)
                i += 1 + run
                last = s
        else:
            last = 0
            for c in cur:
                lits[last if order else 0].encode(rc, c)
                last = c
        body = bytes([0 if max_sym == 256 else max_sym]) + rc.finish()
    out.append(flags)
    if not nosz:
        out += _uint7(len(data))
    out += pack_meta
    out += body
    return bytes(out)


# fqzcomp parameter flag bits (shared with the native decoder)
FQZ_DO_DEDUP = 2
FQZ_DO_LEN = 4
FQZ_HAVE_QMAP = 16
FQZ_HAVE_PTAB = 32
FQZ_HAVE_DTAB = 64
FQZ_HAVE_QTAB = 128
FQZ_DO_SEL = 8
FQZ_GFLAG_MULTI_PARAM = 1
FQZ_GFLAG_HAVE_STAB = 2
FQZ_GFLAG_DO_REV = 4


def fqz_store_array(arr: list[int]) -> bytes:
    """htscodecs store_array: run lengths per ascending value
    (255-continuation with a trailing 0 for exact multiples), then that
    byte stream RLE'd — a byte equal to its predecessor is followed by a
    count of additional copies. Mirrors fqz_read_array in csrc/cram.cc."""
    tmp = bytearray()
    i = 0
    j = 0
    while i < len(arr):
        if j > 256:
            raise ValueError(
                "store_array requires a non-decreasing table (as all "
                "fqzcomp bucket maps are)")
        start = i
        while i < len(arr) and arr[i] == j:
            i += 1
        r = i - start
        while True:
            tmp.append(min(255, r))
            r -= 255
            if r < 0:
                break
        j += 1
    out = bytearray()
    k = 0
    while k < len(tmp):
        out.append(tmp[k])
        if k and tmp[k] == tmp[k - 1]:
            t = k + 1
            while t < len(tmp) and tmp[t] == tmp[k] and t - k - 1 < 255:
                t += 1
            out.append(t - k - 1)
            k = t - 1
        k += 1
    return bytes(out)


def fqz_encode(recs: list[bytes], qbits: int = 8, qshift: int = 5,
               qloc: int = 7, ploc: int = 0, dloc: int = 13,
               do_len: bool = True, do_dedup: bool = False,
               qmap: bytes | None = None, qtab: list[int] | None = None,
               ptab: list[int] | None = None, dtab: list[int] | None = None,
               context: int = 0) -> bytes:
    """Method-7 fqzcomp stream, single-parameter form (gflags=0). The block
    payload decodes to b"".join(recs)."""
    return fqz_encode31(
        recs,
        [dict(qbits=qbits, qshift=qshift, qloc=qloc, ploc=ploc, dloc=dloc,
              do_len=do_len, do_dedup=do_dedup, qmap=qmap, qtab=qtab,
              ptab=ptab, dtab=dtab, context=context)],
    )


def fqz_encode31(recs: list[bytes], params: list[dict],
                 selectors: list[int] | None = None,
                 stab: list[int] | None = None,
                 reverse: list[bool] | None = None) -> bytes:
    """Method-7 fqzcomp stream covering every CRAM 3.1 shape: one or more
    parameter sets (gflag 1), an explicit selector table (gflag 2; each
    record carries a selector symbol, mapped to a parameter via stab and
    optionally mixed into the context at sloc when the parameter sets
    do_sel), and per-record reversed qualities (gflag 4 — flagged records
    are stored reversed and un-reversed by the decoder). Per-record code
    order is [selector][length][rev][dup][bases]; tables are stored with
    the htscodecs store_array RLE (fqz_store_array). Decoded by
    csrc/cram.cc fqz_decode."""
    nparam = len(params)
    assert nparam >= 1
    selectors = selectors or [0] * len(recs)
    reverse = reverse or [False] * len(recs)
    gflags = 0
    if nparam > 1:
        gflags |= FQZ_GFLAG_MULTI_PARAM
    if stab is not None:
        gflags |= FQZ_GFLAG_HAVE_STAB
    if any(reverse):
        gflags |= FQZ_GFLAG_DO_REV
    do_rev = bool(gflags & FQZ_GFLAG_DO_REV)
    stab_eff = (list(stab) if stab is not None
                else [min(i, nparam - 1) for i in range(256)])
    max_sel = (max(selectors, default=0) if stab is not None
               else (nparam - 1 if nparam > 1 else 0))

    out = bytearray([5, gflags])
    if gflags & FQZ_GFLAG_MULTI_PARAM:
        out.append(nparam)
    if gflags & FQZ_GFLAG_HAVE_STAB:
        out.append(max_sel)
        out += fqz_store_array(stab_eff)

    # normalized per-param state
    P = []
    gmax_sym = 1
    for prm in params:
        qmap = prm.get("qmap")
        if qmap is not None:
            inv = {q: i for i, q in enumerate(qmap)}
            max_sym = len(qmap)
        else:
            inv = None
            max_sym = (max(max(r) for r in recs if r) + 1) if any(recs) else 1
        pflags = 0
        if prm.get("do_len", True):
            pflags |= FQZ_DO_LEN
        if prm.get("do_dedup", False):
            pflags |= FQZ_DO_DEDUP
        if prm.get("do_sel", False):
            pflags |= FQZ_DO_SEL
        if qmap is not None:
            pflags |= FQZ_HAVE_QMAP
        if prm.get("qtab") is not None:
            pflags |= FQZ_HAVE_QTAB
        if prm.get("ptab") is not None:
            pflags |= FQZ_HAVE_PTAB
        if prm.get("dtab") is not None:
            pflags |= FQZ_HAVE_DTAB
        st = dict(
            context=prm.get("context", 0), pflags=pflags, max_sym=max_sym,
            inv=inv, qbits=prm.get("qbits", 8), qshift=prm.get("qshift", 5),
            qloc=prm.get("qloc", 7), sloc=prm.get("sloc", 15),
            ploc=prm.get("ploc", 0), dloc=prm.get("dloc", 13),
            qt=list(prm["qtab"]) if prm.get("qtab") is not None
            else list(range(256)),
            pt=list(prm["ptab"]) if prm.get("ptab") is not None
            else [0] * 1024,
            dt=list(prm["dtab"]) if prm.get("dtab") is not None
            else [0] * 256,
        )
        gmax_sym = max(gmax_sym, max_sym)
        P.append(st)
        out += struct.pack("<H", st["context"])
        out.append(pflags)
        out.append(0 if max_sym == 256 else max_sym)
        out.append((st["qbits"] << 4) | st["qshift"])
        out.append((st["qloc"] << 4) | st["sloc"])
        out.append((st["ploc"] << 4) | st["dloc"])
        if qmap is not None:
            out += bytes(qmap)
        if pflags & FQZ_HAVE_QTAB:
            out += fqz_store_array(st["qt"])
        if pflags & FQZ_HAVE_PTAB:
            out += fqz_store_array(st["pt"])
        if pflags & FQZ_HAVE_DTAB:
            out += fqz_store_array(st["dt"])

    if not all(p["pflags"] & FQZ_DO_LEN for p in P) and recs:
        assert all(len(r) == len(recs[0]) for r in recs), \
            "do_len=False requires fixed-length records"

    rc = _RangeEnc()
    qual: dict[int, _AModel] = {}
    lens = [_AModel(256) for _ in range(4)]
    dup = _AModel(2)
    sel_m = _AModel(256)
    rev_m = _AModel(2)
    prev: bytes | None = None
    first = True
    for ri, rec0 in enumerate(recs):
        assert rec0, "fqzcomp records must be non-empty"
        s_sym = selectors[ri]
        if max_sel:
            sel_m.encode(rc, s_sym)
        st = P[stab_eff[s_sym & 0xFF]]
        rec = rec0[::-1] if (do_rev and reverse[ri]) else rec0
        if first or (st["pflags"] & FQZ_DO_LEN):
            for i in range(4):
                lens[i].encode(rc, (len(rec) >> (8 * i)) & 0xFF)
        first = False
        if do_rev:
            rev_m.encode(rc, 1 if reverse[ri] else 0)
        if st["pflags"] & FQZ_DO_DEDUP:
            is_dup = prev is not None and prev == rec
            dup.encode(rc, 1 if is_dup else 0)
            if is_dup:
                prev = rec
                continue
        inv = st["inv"]
        qt, pt, dt = st["qt"], st["pt"], st["dt"]
        context = st["context"]
        qbits, qshift = st["qbits"], st["qshift"]
        qloc, sloc, ploc, dloc = (st["qloc"], st["sloc"], st["ploc"],
                                  st["dloc"])
        ctx = context
        qctx = 0
        q1 = 0
        delta = 0
        for i, qv in enumerate(rec):
            q = inv[qv] if inv is not None else qv
            m = qual.get(ctx & 0xFFFF)
            if m is None:
                m = qual[ctx & 0xFFFF] = _AModel(gmax_sym)
            m.encode(rc, q)
            qctx = (qctx << qshift) + qt[q]
            ctx = context
            if qbits:
                ctx += (qctx & ((1 << qbits) - 1)) << qloc
            pos = len(rec) - 1 - i
            ctx += pt[pos if pos < 1024 else 1023] << ploc
            ctx += dt[delta if delta < 256 else 255] << dloc
            if st["pflags"] & FQZ_DO_SEL:
                ctx += s_sym << sloc
            delta += 1 if q1 != q else 0
            q1 = q
        prev = rec
    return bytes(out) + rc.finish()


class CoreBits:
    """MSB-first bit stream for the slice core block (BETA/GAMMA values)."""

    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def put_gamma(self, value: int):
        assert value >= 1
        n = value.bit_length() - 1
        self.bits.extend([0] * n)
        self.put(value, n + 1)

    def blob(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 0x80 >> (i & 7)
        return bytes(out)


def _enc_beta(offset: int, nbits: int) -> bytes:
    p = itf8(offset) + itf8(nbits)
    return itf8(6) + itf8(len(p)) + p


def _enc_gamma(offset: int) -> bytes:
    p = itf8(offset)
    return itf8(9) + itf8(len(p)) + p


def _enc_huffman(syms: list[int], lens: list[int]) -> bytes:
    p = itf8(len(syms))
    for v in syms:
        p += itf8(v)
    p += itf8(len(lens))
    for v in lens:
        p += itf8(v)
    return itf8(3) + itf8(len(p)) + p


# ------------------------------------------------------------------- blocks


def _block(method: int, ctype: int, content_id: int, raw: bytes,
           comp: bytes | None = None) -> bytes:
    comp = raw if comp is None else comp
    head = bytes([method, ctype]) + itf8(content_id) + itf8(len(comp)) + itf8(len(raw))
    crc = zlib.crc32(head + comp)
    return head + comp + struct.pack("<I", crc)


def _ext_block(content_id: int, raw: bytes, method: str) -> bytes:
    """External data block with the requested compression."""
    if not raw or method == "raw":
        return _block(0, 4, content_id, raw)
    if method == "gzip":
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return _block(1, 4, content_id, raw, co.compress(raw) + co.flush())
    if method == "rans0":
        return _block(4, 4, content_id, raw, rans_encode_o0(raw))
    if method == "rans1":
        return _block(4, 4, content_id, raw, rans_encode_o1(raw))
    if method == "nx16_0":  # CRAM 3.1
        return _block(5, 4, content_id, raw, nx16_encode(raw, order=0))
    if method == "nx16_1":  # CRAM 3.1
        return _block(5, 4, content_id, raw, nx16_encode(raw, order=1))
    if method == "tok3":  # CRAM 3.1 name tokeniser
        return _block(8, 4, content_id, raw, tok3_encode(raw))
    if method == "arith0":  # CRAM 3.1 adaptive arithmetic
        return _block(6, 4, content_id, raw, arith_encode(raw, order=0))
    if method == "arith1":
        return _block(6, 4, content_id, raw, arith_encode(raw, order=1))
    if method == "tok3a":  # tok3 with arithmetic token streams
        return _block(8, 4, content_id, raw, tok3_encode(raw, use_arith=True))
    if method == "bzip2":  # block method 2; stdlib bz2 is the ground truth
        import bz2 as _bz2

        return _block(2, 4, content_id, raw, _bz2.compress(raw, 9))
    if method == "lzma":  # block method 3; htslib writes .xz containers
        import lzma as _lzma

        return _block(3, 4, content_id, raw,
                      _lzma.compress(raw, format=_lzma.FORMAT_XZ))
    raise ValueError(method)


# data series -> (external content id, block compression)
_SERIES = {
    "BF": (1, "rans0"), "CF": (2, "rans0"), "RI": (3, "rans0"),
    "RL": (4, "rans0"), "AP": (5, "gzip"), "RG": (6, "rans0"),
    "RN": (7, "rans1"), "MF": (8, "rans0"), "NS": (9, "rans0"),
    "NP": (10, "gzip"), "TS": (11, "rans0"), "NF": (12, "rans0"),
    "TL": (13, "rans0"), "FN": (14, "rans0"), "FC": (15, "rans0"),
    "FP": (16, "rans0"), "DL": (17, "rans0"), "BB": (18, "rans1"),
    "BBL": (19, "rans0"), "BS": (20, "rans0"), "IN": (21, "rans1"),
    "SC": (22, "rans1"), "HC": (23, "rans0"), "PD": (24, "rans0"),
    "RS": (25, "rans0"), "BA": (26, "rans1"), "QS": (27, "rans1"),
    "MQ": (28, "rans0"),
}
_EMBEDDED_REF_ID = 99


def _enc_external(cid: int) -> bytes:
    p = itf8(cid)
    return itf8(1) + itf8(len(p)) + p


def _enc_byte_array_stop(stop: int, cid: int) -> bytes:
    p = bytes([stop]) + itf8(cid)
    return itf8(5) + itf8(len(p)) + p


def _enc_byte_array_len(len_cid: int, val_cid: int) -> bytes:
    p = _enc_external(len_cid) + _enc_external(val_cid)
    return itf8(4) + itf8(len(p)) + p


def _comp_header(ref_based: bool, ap_delta: bool, core_codecs: bool = False,
                 v31: bool = False) -> bytes:
    # preservation map
    pres = bytearray()
    entries = [
        (b"RN", bytes([1])),
        (b"AP", bytes([1 if ap_delta else 0])),
        (b"RR", bytes([1 if ref_based else 0])),
        (b"SM", bytes([0x1B] * 5)),  # identity-order substitution codes
        (b"TD", itf8(1) + b"\x00"),  # one empty tag line
    ]
    pres += itf8(len(entries))
    for k, v in entries:
        pres += k + v
    # data series encodings
    S = _SERIES
    enc = {
        # 3.1: NUL-separated names (the tok3 blob layout); 3.0: tab stop
        "RN": _enc_byte_array_stop(0x00 if v31 else 0x09, S["RN"][0]),
        "BB": _enc_byte_array_len(S["BBL"][0], S["BB"][0]),
        "IN": _enc_byte_array_stop(0x00, S["IN"][0]),
        "SC": _enc_byte_array_stop(0x00, S["SC"][0]),
    }
    if core_codecs:
        # exercise the core-stream codecs: canonical HUFFMAN for MQ
        # (multi-symbol), BETA for RL, GAMMA for FN
        enc["MQ"] = _enc_huffman(list(range(64)), [6] * 64)
        enc["RL"] = _enc_beta(0, 20)
        enc["FN"] = _enc_gamma(1)  # raw = value+1 >= 1, decode subtracts
    ds = bytearray()
    keys = [k for k in S if k != "BBL"]
    ds += itf8(len(keys))
    for k in keys:
        ds += k.encode() + enc.get(k, _enc_external(S[k][0]))
    # tag encodings: none
    tags = itf8(0)
    body = itf8(len(pres)) + bytes(pres) + itf8(len(ds)) + bytes(ds) + itf8(len(tags)) + tags
    return _block(0, 1, 0, body)


# --------------------------------------------------------- feature building


def _features(rec: BamRecord, ref: str | None):
    """(features, ok). Each feature: (code, read_pos_1based, payload)."""
    feats = []
    q = 0  # 0-based read cursor
    p = rec.pos  # 0-based reference cursor
    seq = rec.seq
    for n, op in rec.cigar:
        ch = CIGAR_OPS[op]
        if ch in "M=X":
            if ref is None:
                feats.append(("b", q + 1, seq[q:q + n].encode()))
            else:
                for j in range(n):
                    rb = ref[p + j].upper() if p + j < len(ref) else "N"
                    sb = seq[q + j].upper()
                    if sb == rb:
                        continue
                    code = _sub_code(rb, sb)
                    if code is None:
                        feats.append(("b", q + j + 1, sb.encode()))
                    else:
                        feats.append(("X", q + j + 1, code))
            q += n
            p += n
        elif ch == "I":
            ins = seq[q:q + n].encode()
            if n == 1:
                feats.append(("i", q + 1, ins))
            else:
                feats.append(("I", q + 1, ins))
            q += n
        elif ch == "S":
            feats.append(("S", q + 1, seq[q:q + n].encode()))
            q += n
        elif ch == "D":
            feats.append(("D", q + 1, n))
            p += n
        elif ch == "N":
            feats.append(("N", q + 1, n))
            p += n
        elif ch == "H":
            feats.append(("H", q + 1, n))
        elif ch == "P":
            feats.append(("P", q + 1, n))
        else:
            return None, False
    return feats, True


_SUB_ALTS = {"A": "CGTN", "C": "AGTN", "G": "ACTN", "T": "ACGN", "N": "ACGT"}


def _sub_code(refbase: str, readbase: str) -> int | None:
    """2-bit code under the identity SM matrix (byte 0x1b: code == alt rank)."""
    alts = _SUB_ALTS.get(refbase, _SUB_ALTS["N"])
    i = alts.find(readbase)
    return None if i < 0 else i


def _endpos(rec: BamRecord) -> int:
    if (rec.flag & 4) or not rec.cigar:
        return rec.pos + 1
    span = ref_span(rec.cigar)
    return rec.pos + (span if span else 1)


def _mate_reconstruct_ok(a: BamRecord, b: BamRecord) -> bool:
    """True iff downstream-mate decoding reproduces both records exactly."""
    fa = a.flag | (0x20 if b.flag & 0x10 else 0) | (0x8 if b.flag & 0x4 else 0)
    fb = b.flag | (0x20 if a.flag & 0x10 else 0) | (0x8 if a.flag & 0x4 else 0)
    if fa != a.flag or fb != b.flag:
        return False
    if a.mate_tid != b.tid or a.mate_pos != b.pos:
        return False
    if b.mate_tid != a.tid or b.mate_pos != a.pos:
        return False
    tlen = max(_endpos(a), _endpos(b)) - min(a.pos, b.pos)
    want_a = tlen if a.pos <= b.pos else -tlen
    return a.isize == want_a and b.isize == -want_a


# ------------------------------------------------------------------- writer


def write_cram(path: str, header_text: str, targets: list[tuple[str, int]],
               records: list[BamRecord], fasta=None, write_index: bool = True,
               slice_size: int = 4096, ap_delta: bool = True,
               embed_ref: bool = False, core_codecs: bool = False,
               v31: bool = False, v31_arith: bool = False,
               bz_lzma: bool = False):
    """Write a CRAM 3.0 (+ .crai). `fasta` is a path, a dict name->seq, or
    None (verbatim base encoding, RR=false). Records should be
    coordinate-sorted for meaningful .crai queries. With `v31`, writes a
    CRAM 3.1 file whose external blocks use the rANSNx16 codec; with
    `v31_arith` additionally, the adaptive arithmetic codec (method 6),
    fqzcomp for stored qualities (method 7) and arithmetic tok3 token
    streams. With `bz_lzma`, external blocks use bzip2/lzma block
    compression (methods 2/3, compressed by the Python stdlib — independent
    ground truth for the native decoders; htslib accepts such files via
    --output-fmt-option use_bzip2/use_lzma)."""
    refs: dict[str, str] = {}
    if isinstance(fasta, dict):
        refs = {k: v.upper() for k, v in fasta.items()}
    elif isinstance(fasta, str):
        from strling_tpu.io.fasta import Fasta

        fa = Fasta(fasta)
        refs = {name: fa.get(name).upper() for name, _ in targets}
    ref_based = fasta is not None

    out = open(path, "wb")
    minor = b"\x01" if v31 else b"\x00"
    out.write(b"CRAM\x03" + minor + (path.encode() + b"\x00" * 20)[:20])
    # SAM header container (one FILE_HEADER block)
    htext = header_text.encode()
    hblock = _block(0, 0, 0, struct.pack("<i", len(htext)) + htext)
    hdr_cont = _cont_header(len(hblock), -1, 0, 0, 0, 0, 0, 1, [0])
    out.write(hdr_cont + hblock)

    # slice partition: fixed-size chunks; with an embedded reference, also
    # split at tid changes (a multiref slice cannot embed its reference)
    chunks = []
    cur: list[BamRecord] = []
    for r in records:
        if cur and (len(cur) >= slice_size
                    or (embed_ref and r.tid != cur[0].tid)):
            chunks.append(cur)
            cur = []
        cur.append(r)
    if cur:
        chunks.append(cur)

    crai_lines = []
    counter = 0
    for chunk in chunks:
        payload, ref_id, start, span, nbases, landmark, ssize = _container(
            chunk, refs, targets, ref_based, ap_delta, embed_ref, counter,
            core_codecs, v31, v31_arith, bz_lzma)
        coff = out.tell()
        out.write(payload)
        counter += len(chunk)
        crai_lines.append((ref_id, start if ref_id >= 0 else 0,
                           span if ref_id >= 0 else 0, coff, landmark, ssize))
    out.write(bytes.fromhex(
        "0f000000ffffffff0fe0454f4600000000010005bdd94f"
        "0001000606010001000100ee63014b"))
    out.close()

    if write_index:
        txt = "".join(
            f"{r}\t{s}\t{sp}\t{c}\t{l}\t{z}\n" for r, s, sp, c, l, z in crai_lines
        )
        with _gzip.open(path + ".crai", "wb") as f:
            f.write(txt.encode())


def _cont_header(length: int, ref_id: int, start: int, span: int, n_rec: int,
                 counter: int, nbases: int, n_blocks: int,
                 landmarks: list[int]) -> bytes:
    h = struct.pack("<i", length)
    h += itf8(ref_id) + itf8(start) + itf8(span) + itf8(n_rec)
    h += ltf8(counter) + ltf8(nbases) + itf8(n_blocks)
    h += itf8(len(landmarks))
    for l in landmarks:
        h += itf8(l)
    h += struct.pack("<I", 0)  # header crc (not verified by the reader)
    return h


def _container(chunk: list[BamRecord], refs, targets, ref_based: bool,
               ap_delta: bool, embed_ref: bool, counter: int,
               core_codecs: bool = False, v31: bool = False,
               v31_arith: bool = False, bz_lzma: bool = False):
    tids = {r.tid for r in chunk}
    if len(tids) == 1:
        ref_id = chunk[0].tid
    else:
        ref_id = -2
    if ref_id >= 0:
        start = min(r.pos for r in chunk) + 1
        span = max(_endpos(r) for r in chunk) - (start - 1)
    else:
        start = span = 0

    # streams
    st = {k: bytearray() for k in _SERIES}
    qual_recs: list[bytes] = []  # per-record quals for the fqzcomp block
    core = CoreBits()
    ap_last = start

    # same-slice downstream mates (verified reconstruction, else detached)
    mate_link = [-1] * len(chunk)
    is_mate_target = [False] * len(chunk)
    by_qname: dict[str, int] = {}
    for i, r in enumerate(chunk):
        if r.qname in by_qname:
            j = by_qname[r.qname]
            if (mate_link[j] < 0 and not is_mate_target[j]
                    and (r.flag & 1) and (chunk[j].flag & 1)
                    and _mate_reconstruct_ok(chunk[j], r)):
                mate_link[j] = i
                is_mate_target[i] = True
        else:
            by_qname[r.qname] = i

    ref_cache: dict[int, str | None] = {}

    def ref_for(tid: int):
        if tid not in ref_cache:
            name = targets[tid][0] if 0 <= tid < len(targets) else None
            ref_cache[tid] = refs.get(name) if name else None
        return ref_cache[tid]

    nbases = 0
    for i, r in enumerate(chunk):
        nbases += len(r.seq)
        cf = 0
        feats = None
        if not (r.flag & 4):
            ref = ref_for(r.tid) if ref_based else None
            feats, ok = _features(r, ref)
            if not ok:
                raise ValueError("unsupported CIGAR for CRAM write")
        qual = getattr(r, "qual", None)
        if qual is not None:
            cf |= 0x1  # stored (non-default) quality scores
            q = qual.encode() if isinstance(qual, str) else bytes(qual)
            if len(q) != len(r.seq):
                raise ValueError("qual length != seq length")
            # CRAM stores raw phred values; ASCII input is phred+33
            qrec = bytes((b - 33) & 0xFF for b in q) \
                if isinstance(qual, str) else bytes(q)
            st["QS"] += qrec
            qual_recs.append(qrec)
        if mate_link[i] >= 0:
            cf |= 0x4
        elif not is_mate_target[i]:
            cf |= 0x2
        st["BF"] += itf8(r.flag)
        st["CF"] += itf8(cf)
        if ref_id == -2:
            st["RI"] += itf8(r.tid)
        if core_codecs:
            core.put(len(r.seq), 20)  # BETA(offset=0, 20 bits)
        else:
            st["RL"] += itf8(len(r.seq))
        ap = r.pos + 1
        if ap_delta:
            st["AP"] += itf8(ap - ap_last)
            ap_last = ap
        else:
            st["AP"] += itf8(ap)
        st["RG"] += itf8(-1)
        st["RN"] += r.qname.encode() + (b"\x00" if v31 else b"\x09")
        if cf & 0x2:
            mf = (1 if r.flag & 0x20 else 0) | (2 if r.flag & 0x8 else 0)
            st["MF"] += itf8(mf)
            st["NS"] += itf8(r.mate_tid)
            st["NP"] += itf8(r.mate_pos + 1)
            st["TS"] += itf8(r.isize)
        elif cf & 0x4:
            st["NF"] += itf8(mate_link[i] - i - 1)
        st["TL"] += itf8(0)
        if not (r.flag & 4):
            if core_codecs:
                core.put_gamma(len(feats) + 1)  # GAMMA(offset=1)
            else:
                st["FN"] += itf8(len(feats))
            prev = 0
            for code, fpos, payload in feats:
                st["FC"].append(ord(code))
                st["FP"] += itf8(fpos - prev)
                prev = fpos
                if code == "X":
                    st["BS"].append(payload)
                elif code == "S":
                    st["SC"] += payload + b"\x00"
                elif code == "I":
                    st["IN"] += payload + b"\x00"
                elif code == "i":
                    st["BA"] += payload
                elif code == "b":
                    st["BBL"] += itf8(len(payload))
                    st["BB"] += payload
                elif code in "DNPH":
                    key = {"D": "DL", "N": "RS", "P": "PD", "H": "HC"}[code]
                    st[key] += itf8(payload)
            if core_codecs:
                assert r.mapq < 64, "core-codec mode caps MAPQ at 63"
                core.put(r.mapq, 6)  # canonical HUFFMAN, all lengths 6
            else:
                st["MQ"] += itf8(r.mapq)
        else:
            st["BA"] += r.seq.encode()

    # blocks: core (bit stream; empty unless core_codecs) + external streams
    blocks = bytearray()
    blocks += _block(0, 5, 0, core.blob())
    content_ids = []
    for key, (cid, method) in _SERIES.items():
        if v31:  # CRAM 3.1: rANSNx16 everywhere, tok3 for read names
            method = {"rans0": "nx16_0", "rans1": "nx16_1",
                      "gzip": "nx16_0"}.get(method, method)
            if key == "RN":
                method = "tok3"
            if v31_arith:  # adaptive coder + fqz quals + arith tok3
                method = {"nx16_0": "arith0", "nx16_1": "arith1",
                          "tok3": "tok3a"}[method]
        if bz_lzma:  # methods 2/3: sequence-ish streams lzma, rest bzip2
            method = "lzma" if key in ("BA", "QS", "RN") else "bzip2"
        if (key == "QS" and v31 and v31_arith and qual_recs
                and all(qual_recs)):
            raw = bytes(st[key])
            blocks += _block(7, 4, cid, raw, fqz_encode(qual_recs))
            content_ids.append(cid)
            continue
        blocks += _ext_block(cid, bytes(st[key]), method)
        content_ids.append(cid)
    if embed_ref and ref_id >= 0 and ref_based:
        ref = ref_for(ref_id) or ""
        blocks += _ext_block(_EMBEDDED_REF_ID, ref[start - 1:start - 1 + span].encode(), "gzip")
        content_ids.append(_EMBEDDED_REF_ID)

    shdr = itf8(ref_id) + itf8(start) + itf8(span) + itf8(len(chunk))
    shdr += ltf8(counter) + itf8(len(content_ids) + 1)
    shdr += itf8(len(content_ids))
    for cid in content_ids:
        shdr += itf8(cid)
    shdr += itf8(_EMBEDDED_REF_ID if (embed_ref and ref_id >= 0 and ref_based) else -1)
    shdr += b"\x00" * 16  # md5 (not verified)
    slice_hdr_block = _block(0, 2, 0, shdr)

    comp = _comp_header(ref_based, ap_delta, core_codecs, v31)
    payload = comp + slice_hdr_block + bytes(blocks)
    landmark = len(comp)
    ssize = len(slice_hdr_block) + len(blocks)
    n_blocks = 2 + 1 + len(content_ids)  # comp hdr + slice hdr + core + ext
    hdr = _cont_header(len(payload), ref_id, start, span, len(chunk), counter,
                       nbases, n_blocks, [landmark])
    return hdr + payload, ref_id, start, span, nbases, landmark, ssize
