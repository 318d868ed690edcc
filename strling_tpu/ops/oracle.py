"""Pure-Python executable specification of the reference repeat detector.

This is a line-faithful port of the reference's hot loop — NOT the production
path (that is the batched JAX kernel in strling_tpu.ops.kmer). It exists to
(a) pin the exact semantics with citations and (b) cross-validate the device
kernel on random and fixture inputs.

Ported semantics, with citations into /root/reference:
- slide_by (src/strpkg/utils.nim:10-35): non-overlapping windows of width k at
  stride k; each window contributes the minimum over its k cyclic rotations of
  the 2-bit-encoded code.
- count (utils.nim:205-211): histogram of window codes; modal code with the
  reference's running-argmax tie-break (Seq.inc, utils.nim:192-198: a code
  replaces the current argmax only when its count becomes strictly greater,
  so on final ties the code whose winning count was reached FIRST wins).
- get_repeat (utils.nim:236-271): the k=2..6 scan with kmer-estimated score,
  early exit, exact substring recount, proportion threshold and homopolymer
  reduction.
"""

from __future__ import annotations

from strling_tpu.ops.encode import decode_kmer, reduce_repeat


def slide_by(s: str, k: int) -> list[int]:
    """Window min-rotation codes (utils.nim:10-35)."""
    out = []
    n = len(s)
    if k > n:
        return out
    mask = (1 << (2 * k)) - 1

    def code(c: str) -> int:
        return (ord(c) >> 1) & 3

    # first window [0, k)
    f = 0
    for c in s[:k]:
        f = ((f << 2) | code(c)) & mask
    kmin = f
    for j in range(k):
        f = ((f << 2) | code(s[j])) & mask
        kmin = min(kmin, f)
    out.append(kmin)

    # subsequent windows at i = k, 2k, ... while i + k <= n
    i = k
    while i + k <= n:
        for m in range(k):
            f = ((f << 2) | code(s[i + m])) & mask
        kmin = f
        for j in range(k):
            f = ((f << 2) | code(s[i + j])) & mask
            kmin = min(kmin, f)
        out.append(kmin)
        i += k
    return out


def modal_window_code(s: str, k: int) -> tuple[int, int]:
    """(modal code, count) with the reference's running-argmax tie-break.

    Returns (-1, 0) when there are no windows (len(s) < k), matching
    count==0 / imax==-1 (utils.nim:205-211).
    """
    counts: dict[int, int] = {}
    imax = -1
    for enc in slide_by(s, k):
        c = counts.get(enc, 0) + 1
        counts[enc] = c
        if imax == -1 or c > counts[imax]:
            imax = enc
    if imax == -1:
        return -1, 0
    return imax, counts[imax]


def nonoverlapping_count(s: str, sub: str) -> int:
    """Nim strutils.count(s, sub) == Python str.count: non-overlapping."""
    return s.count(sub)


def get_repeat(read: str, proportion_repeat: float) -> tuple[str, int]:
    """Port of utils.nim:236-271. Returns (repeat_unit, repeat_count).

    repeat_unit is "" when the read is not STR-like. repeat_count includes the
    homopolymer-reduction multiplier (utils.nim:271).
    """
    if read.count("N") > 20:  # utils.nim:238
        return "", 0

    best_score = -1
    result = ""
    repeat_count = 0
    L = len(read)
    for k in range(2, 7):
        imax, count = modal_window_code(read, k)
        # decode of imax: imax == -1 decodes as all-ones bits -> "G"*k,
        # exactly like Nim's imax.uint64 underflow (utils.nim:197,246)
        s = decode_kmer(imax if imax >= 0 else (1 << (2 * k)) - 1, k)
        score = count * k
        if score <= best_score:
            if count < int(L * 0.12 / k):  # utils.nim:251
                break
            continue
        count = nonoverlapping_count(read, s)  # utils.nim:254
        score = count * k
        if score < best_score:  # utils.nim:256
            continue
        best_score = score
        if count > int(L * proportion_repeat / k):  # utils.nim:259
            # inner >= check (utils.nim:261) is implied by the strict > above
            result = s
            repeat_count = count

    unit, mult = reduce_repeat(result)
    return unit, repeat_count * mult
