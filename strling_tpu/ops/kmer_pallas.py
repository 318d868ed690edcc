"""Pallas TPU kernel for the repeat-unit scan.

Same semantics as ops.kmer.get_repeat_device (see its docstring and the
utils.nim citations there), but laid out for the VPU: reads ride the lane
dimension ([L, TILE_B] position-major tiles resident in VMEM), so every
per-read scalar state machine (window rotation minima, modal counting, the
greedy exact recount, the k-selection scan) becomes an elementwise op over a
tile of reads with zero HBM round-trips. The XLA version's [B, W, k]
reshape/rotation gathers — which dominate its runtime as layout changes —
disappear entirely.

Outputs are compact per-read scalars: a base-4 packed unit code + unit length
+ repeat count; ASCII decoding happens on host (ops.kmer.unpack_unit_codes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strling_tpu.ops.kmer import KS

TILE_B = 1024
NEG = -1

# modal NE-count implementation for k >= 3: "pairwise" (triangular packed
# loop, DEFAULT) or "sorted" (bitonic sort over the window axis + segmented
# scans — O(W log^2 W) vs O(W^2)). Both are exact w.r.t. the reference
# tie-break (oracle tests + hardware gates pass 0/32768 on either).
# Measured on v5e at equal load: pairwise 0.53ms/batch vs sorted 0.66ms —
# the bitonic network's 21 sequential rotate/select stages are
# latency-bound on the VPU while the triangular loop's wide independent
# row ops pipeline better, so asymptotic op count loses to ILP here.
# Kept env-switchable (STRLING_MODAL_IMPL=sorted) as the documented
# outcome of the r3-scoped 'cheaper modal counting' candidate.
import os as _os

MODAL_IMPL = _os.environ.get("STRLING_MODAL_IMPL", "pairwise")


def _modal_sorted(wmin, validw, widx, W, TB):
    """Modal window code + count with the reference's running-argmax
    tie-break, via a bitonic sort along the (sublane) window axis.

    Sort keys: valid windows -> code*64 + widx (stable by construction);
    invalid/pad -> large sentinels that sort last and form length-1 runs.
    After sorting, equal-code runs are contiguous and ordered by widx, so
    per-run totals and last-occurrence indices come from two segmented
    doubling scans; the winner is max (total, earliest-last-occurrence) —
    exactly CountTable.largest's reach-max-first rule (utils.nim:192-211).
    All shuffles are sublane rotations (partner idx^s == roll by +-s
    selected per row), which Mosaic lowers natively.
    """
    P = 2
    while P < max(W, 2):
        P *= 2
    idxW = jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0)
    key = jnp.where(validw, (wmin << 6) | idxW, (1 << 20) + idxW)
    if P > W:
        padrow = (1 << 21) + jax.lax.broadcasted_iota(
            jnp.int32, (P - W, TB), 0
        )
        key = jnp.concatenate([key, padrow], axis=0)
    idx = jax.lax.broadcasted_iota(jnp.int32, (P, TB), 0)

    # bitonic sort, ascending along axis 0
    size = 2
    while size <= P:
        s = size >> 1
        while s >= 1:
            pv = jnp.where(
                (idx & s) == 0,
                jnp.roll(key, -s, axis=0),
                jnp.roll(key, s, axis=0),
            )
            asc = (idx & size) == 0
            i_low = (idx & s) == 0
            key = jnp.where(asc == i_low, jnp.minimum(key, pv),
                            jnp.maximum(key, pv))
            s >>= 1
        size <<= 1

    code_s = key >> 6
    # run starts where the code changes (row 0 always starts a run)
    prev = jnp.roll(code_s, 1, axis=0)
    is_start = (idx == 0) | (code_s != prev)
    # start_of_run = inclusive prefix-max of (is_start ? idx : -1)
    m = jnp.where(is_start, idx, -1)
    d = 1
    while d < P:
        sh = jnp.where(idx >= d, jnp.roll(m, d, axis=0), -1)
        m = jnp.maximum(m, sh)
        d <<= 1
    run_start = m
    # segmented suffix-max of idx*64 + widx: yields the run's end index and
    # the widx at the end (the LAST occurrence) in one pass
    pk = idx * 64 + (key & 63)
    d = 1
    while d < P:
        shv = jnp.roll(pk, -d, axis=0)
        shr = jnp.roll(run_start, -d, axis=0)
        ok = (idx + d < P) & (shr == run_start)
        pk = jnp.maximum(pk, jnp.where(ok, shv, -1))
        d <<= 1
    endi = pk >> 6
    lastw = pk & 63
    total = endi - run_start + 1

    valid_run = code_s < 4096  # sentinels sort past every real code
    rank = total * 64 + (63 - lastw)
    packv = jnp.where(valid_run, rank * 4096 + code_s, -1)
    best = jnp.max(packv, axis=0, keepdims=True)
    modal = jnp.where(best >= 0, best & 4095, NEG)
    kcount = jnp.where(best >= 0, (best >> 12) // 64, 0)
    return modal, kcount


def _modal_pairwise(wmin, validw, widx, W, TB, tot_s, k):
    """Modal window code + count with the reference's running-argmax
    tie-break (utils.nim:192-211), via triangular packed NE-counting over
    PREDECESSORS only.

    Key identity: the CountTable winner is the code whose final (maximal)
    count M is REACHED first, i.e. the earliest window j whose running
    occurrence count occ(j) = j+1 - ne_before(j) equals M — and M itself is
    max_j occ(j) (the most frequent code's last occurrence has occ == its
    total; no code with a smaller total ever reaches M). So only the
    strictly-lower-triangle NE counts are needed: the former matches-after
    accumulator and its per-step cross-row reduction drop out, halving the
    passes in the O(W^2) loop.

    SWAR field layout per i32 lane: k==3 packs FOUR reads in 8-bit fields
    (codes < 64, sentinels 64+widx <= 113 < 128, counts <= W-1 < 127 — no
    field ever reaches its halfword bit), other ks pack two reads in 16-bit
    fields. The "differs" bit per field comes from one add + mask: v + (2^
    (fb-1)-1) sets bit fb-1 iff v > 0, with no cross-field carry since
    v <= 2^(fb-1)-1 and counts stay below 2^(fb-1).

    Returns (modal [1,TB] — NEG when no valid window, kcount [1,TB])."""
    nf = 4 if k == 3 else 2
    fb = 32 // nf
    TBF = TB // nf
    addc = 0
    nemask = 0
    for f in range(nf):
        addc |= ((1 << (fb - 1)) - 1) << (f * fb)
        nemask |= 1 << (f * fb)
    sent = jnp.where(validw, wmin, (1 << (2 * k)) + widx)
    parts = [jax.lax.slice(sent, (0, f * TBF), (W, (f + 1) * TBF))
             for f in range(nf)]
    pw = parts[0]
    for f in range(1, nf):
        pw = pw | (parts[f] << (f * fb))
    tot_s[:W, :TBF] = jnp.zeros((W, TBF), jnp.int32)
    # 4-row blocking: the four rows of a block share ONE read-modify-write
    # of the accumulator over their common tail [iend, W) (the per-field
    # block sum is <= 4, far below the field headroom), and the block's
    # internal strictly-lower pairs are a handful of single-row ops — ~40%
    # fewer passes over the O(W^2) triangle than the row-at-a-time loop
    BLK = 4
    i0 = 0
    while i0 < W - 1:
        iend = min(i0 + BLK, W - 1)
        nb = iend - i0
        rows = [jax.lax.slice(pw, (a, 0), (a + 1, TBF))
                for a in range(i0, iend)]
        # arithmetic shift sign-fill only touches bits above the highest
        # mask bit (f_max*fb), so the & keeps exactly the per-field ne flags
        for bi in range(1, nb):
            acc = None
            for ai in range(bi):
                nepp = (((rows[bi] ^ rows[ai]) + addc) >> (fb - 1)) & nemask
                acc = nepp if acc is None else acc + nepp
            tot_s[i0 + bi:i0 + bi + 1, :TBF] = (
                tot_s[i0 + bi:i0 + bi + 1, :TBF] + acc)
        rest = jax.lax.slice(pw, (iend, 0), (W, TBF))
        acc = None
        for ai in range(nb):
            nepp = (((rest ^ rows[ai]) + addc) >> (fb - 1)) & nemask
            acc = nepp if acc is None else acc + nepp
        tot_s[iend:W, :TBF] = tot_s[iend:W, :TBF] + acc
        i0 = iend
    tot_p = tot_s[:W, :TBF]
    fm = (1 << fb) - 1
    ne_before = jnp.concatenate(
        [(tot_p >> (f * fb)) & fm for f in range(nf)], axis=1)
    occ = jnp.where(validw, widx + 1 - ne_before, 0)
    M = jnp.max(occ, axis=0, keepdims=True)
    cand = validw & (occ == M) & (M > 0)
    jstar = jnp.min(jnp.where(cand, widx, W), axis=0, keepdims=True)
    sel = cand & (widx == jstar)
    modal = jnp.max(jnp.where(sel, wmin, NEG), axis=0, keepdims=True)
    kcount = jnp.where(modal >= 0, M, 0)
    return modal, kcount


def _kernel(bases_ref, lengths_ref, te_ref, tp_ref, code_out, len_out, cnt_out,
            match_s, tot_s, variant="full", packed=False):
    """variant toggles exist ONLY for the stage-attribution experiment
    (scripts/exp_kernel_timing.py): "full" (production), "no_greedy" (exact
    recount replaced by the modal estimate), "no_modal" (modal replaced by
    the first valid window code), "winmin_only" (neither).

    With `packed` (the n8 fused path), bases_ref holds the 2-bit packed
    payload rows [L/4, TB] directly — N-free ACGT-only by construction, so
    the N/IUPAC logic drops out, and the phase-interleaved position order
    of the unpacked code blocks is absorbed into the band-matmul column
    permutation (everything downstream reads the natural-order gram6/full2
    outputs)."""
    do_modal = variant in ("full", "no_greedy")
    do_greedy = variant in ("full", "no_modal")
    if packed:
        L4, TB = bases_ref.shape
        L = 4 * L4
        lengths = lengths_ref[...].astype(jnp.int32)  # [1, TB]
        pk = bases_ref[...].astype(jnp.int32)
        # σ-order codes: block m row t holds position 4t + m
        codes_sig = jnp.concatenate(
            [(pk >> (2 * m)) & 3 for m in range(4)], axis=0
        )  # [L, TB]
        skip = jnp.zeros((1, TB), jnp.bool_)
        codes3_src = codes_sig  # ACGT-only: the IUPAC flag bit is always 0
        codes_src = codes_sig
        # column q of the band matrices addresses position sig(q)
        qix = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        col_pos = 4 * (qix % L4) + qix // L4
    else:
        L, TB = bases_ref.shape
        basesi = bases_ref[...].astype(jnp.int32)  # u8 compares don't lower
        codes = (basesi >> 1) & 3  # [L, TB]
        lengths = lengths_ref[...].astype(jnp.int32)  # [1, TB]
        n_mask = (basesi == ord("N")) & (
            jax.lax.broadcasted_iota(jnp.int32, (L, TB), 0) < lengths
        )
        skip = n_mask.astype(jnp.int32).sum(axis=0, keepdims=True) > 20
        # 3-bit digits for the exact-recount posgram: 2-bit code + a "not
        # the canonical letter" flag. The reference's recount compares raw
        # read bytes against the ACTG-decoded kmer (utils.nim:254), so N and
        # every other IUPAC byte (which shares a 2-bit code with a real
        # base, e.g. 'R'->'C') must never match: flag any byte that is not
        # itself the decoded letter of its own code
        # (A=65 C=67 T=84 G=71 == 65+2d+15*(d==2))
        canon_ascii = 65 + 2 * codes + 15 * (codes == 2).astype(jnp.int32)
        codes3_src = codes | ((basesi != canon_ascii).astype(jnp.int32) << 2)
        codes_src = codes
        col_pos = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    # one 6-digit gram per position; every k's posgram is a single shift of
    # it (gram_k[j] = top 3k bits = digits j..j+k-1), and the shared 2-bit
    # rolling encode full2[p] = encode of bases p..p+5, whose top 2k bits
    # are kmer k's encode at p. Both are banded position sums
    # Sum_m digit[j+m] * B^(5-m), so the MXU computes them in ONE matmul
    # each instead of six sublane rolls: the band weights are powers of two
    # (exact in bf16) and digits are <= 7 (3 bits), so even default-precision
    # MXU products are exact, and f32 accumulation of sums < 2^18 is exact.
    # Positions past L get 0 digits (the rolls wrapped instead) — those
    # digits are only ever read for j+k > len rows, which the per-k length
    # gates kill either way. Output row j is the NATURAL position j; the
    # input column's position is col_pos (identity, or σ for packed input).
    bj6 = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    brel = col_pos - bj6
    bin_band = (brel >= 0) & (brel < 6)
    brel_c = jnp.where(bin_band, brel, 0)
    w_gram = jnp.where(bin_band, jnp.left_shift(1, 3 * (5 - brel_c)),
                       0).astype(jnp.float32)
    w_full = jnp.where(bin_band, jnp.left_shift(1, 2 * (5 - brel_c)),
                       0).astype(jnp.float32)
    codes3_f = codes3_src.astype(jnp.float32)
    codes_f = codes_src.astype(jnp.float32)
    gram6 = jnp.dot(w_gram, codes3_f,
                    preferred_element_type=jnp.float32).astype(jnp.int32)
    full2 = jnp.dot(w_full, codes_f,
                    preferred_element_type=jnp.float32).astype(jnp.int32)

    per_k = []
    for ki, k in enumerate(KS):
        W = L // k
        # --- window min-rotation codes (utils.nim:10-35) -------------------
        # Cyclic-rotation minima without any sequential loop: the reference
        # rotates the window's own bases (slide_by re-adds s[j*k..j*k+k)),
        # so every rotation is a digit-rotate of the window's packed code —
        # rot(f) = ((f<<2)&mask) | (f>>2(k-1)). Compute the rotate-min at
        # EVERY position from the shared rolling encode (k-1 elementwise
        # steps over [L,TB]), then pull the stride-k window rows out with a
        # 0/1 selection matmul (values < 4^6 are exact in f32; strided
        # sublane slices don't lower in Mosaic, the MXU does this for free).
        mask = (1 << (2 * k)) - 1
        fk = full2 >> (2 * (6 - k))  # [L, TB] encode of bases p..p+k-1
        rowi = jax.lax.broadcasted_iota(jnp.int32, (W, L), 0)
        coli = jax.lax.broadcasted_iota(jnp.int32, (W, L), 1)
        sel = (coli == rowi * k).astype(jnp.float32)
        # Select the stride-k window codes FIRST (row selection commutes
        # with the per-window rotation chain), so the k-1 rotate-min steps
        # run on [W, TB] instead of [L, TB] — k x less rotate work.
        # Default (bf16-pass) MXU precision is exact here because sel rows
        # are one-hot (a single product, no accumulation error) and every
        # value fed to the MXU stays in bf16's exact-integer range (<= 256):
        # codes < 4^k fit directly for k <= 4; 5/6-mer codes < 4096 go
        # through as two 6-bit halves recombined after the select. This
        # replaces the former Precision.HIGHEST contraction (3 bf16 passes)
        # with 1-2 single-pass matmuls — the select stage was the largest
        # MXU cost in the kernel.
        if k <= 4:
            wsel = jnp.dot(sel, fk.astype(jnp.float32),
                           preferred_element_type=jnp.float32).astype(jnp.int32)
        else:
            hi = jnp.dot(sel, (fk >> 6).astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(jnp.int32)
            lo = jnp.dot(sel, (fk & 63).astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(jnp.int32)
            wsel = (hi << 6) | lo
        wmin = wsel
        f = wsel
        for _ in range(k - 1):
            f = ((f << 2) & mask) | (f >> (2 * (k - 1)))
            wmin = jnp.minimum(wmin, f)
        win_end = (jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0) + 1) * k
        validw = win_end <= lengths  # [W, TB]
        wmin = jnp.where(validw, wmin, NEG)

        # --- modal code with running-argmax tie-break (utils.nim:192-211) --
        # Winner = the code with the highest total whose LAST occurrence
        # comes earliest (same semantics as the reference's running
        # CountTable argmax; cross-validated in tests/test_kmer*.py).
        widx = jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0)
        if not do_modal:
            # first valid window code stands in for the modal code
            jfirst = jnp.min(jnp.where(validw, widx, W), axis=0, keepdims=True)
            modal = jnp.max(jnp.where(validw & (widx == jfirst), wmin, NEG),
                            axis=0, keepdims=True)
            kcount = validw.astype(jnp.int32).sum(axis=0, keepdims=True)
            kcount = jnp.where(modal >= 0, kcount, 0)
        elif k == 2:
            # by value: only 16 possible window codes, so count each code
            # directly instead of the O(W^2) pairwise loop
            M = jnp.zeros((1, TB), jnp.int32)
            best_last = jnp.full((1, TB), W, jnp.int32)
            modal = jnp.full((1, TB), NEG, jnp.int32)
            for v in range(1 << (2 * k)):
                eq = wmin == v  # invalid windows are NEG and never match
                tot = eq.astype(jnp.int32).sum(axis=0, keepdims=True)
                last = jnp.max(jnp.where(eq, widx, -1), axis=0, keepdims=True)
                better = (tot > M) | ((tot == M) & (tot > 0) & (last < best_last))
                M = jnp.where(better, tot, M)
                best_last = jnp.where(better, last, best_last)
                modal = jnp.where(better, v, modal)
            kcount = jnp.where(modal >= 0, M, 0)  # [1, TB]
        elif MODAL_IMPL == "sorted":
            modal, kcount = _modal_sorted(wmin, validw, widx, W, TB)
        else:
            # Triangular packed NE-counting over predecessors only (SWAR
            # over i32 lanes; see _modal_pairwise for the field layout and
            # the reach-max-first identity that replaces the reference's
            # running CountTable argmax, utils.nim:192-211). Equivalent to
            # the O(W^2)-compare pairwise form kept in ops/kmer.py's XLA
            # path, several-fold cheaper: unique sentinels (4^k+row) for
            # invalid windows, 2 reads per lane (4 for k=3), and only the
            # strictly-lower triangle of pairs is counted.
            modal, kcount = _modal_pairwise(wmin, validw, widx, W, TB,
                                            tot_s, k)
        # decode: modal == -1 behaves as all-ones bits ("G"*k, utils.nim:197)
        modal_eff = jnp.where(modal < 0, (1 << (2 * k)) - 1, modal)

        if not do_greedy:
            per_k.append((kcount, kcount, modal_eff))
            continue

        # --- exact non-overlapping recount (utils.nim:254) -----------------
        # match[j] <=> the modal kmer occurs at bases[j..j+k). One 3-bit
        # "posgram" per position (digits are 2-bit base codes with an N flag
        # as bit 2, so N positions can never equal the modal digits) built
        # from k sublane rolls; a single [L,TB] compare against the packed
        # modal code replaces k shifted ASCII compares + pad copies. Rolled
        # wrap-around rows land at j > len-k and are killed by the length
        # gate. The result is lane-packed 2-reads-per-i32 for the blocked
        # greedy scan below.
        gram = gram6 >> (3 * (6 - k))
        modal3 = jnp.zeros((1, TB), jnp.int32)
        for m in range(k):
            digit = (modal_eff >> (2 * (k - 1 - m))) & 3
            modal3 = modal3 | (digit << (3 * (k - 1 - m)))
        jpos = jax.lax.broadcasted_iota(jnp.int32, (L, TB), 0)
        match = ((gram == modal3) & ((jpos + k) <= lengths)).astype(jnp.int32)

        # Bit-packed blocked greedy: blocks of 4k positions hold at most 4
        # non-overlapping takes (each take blocks the next k positions), so
        # the reference's L-step linear scan (utils.nim:254-262) collapses
        # to ceil(L/4k) sequential steps of pure bit arithmetic. Block b's
        # match bits pack into one i32 lane via an MXU selection matmul
        # (weights 2^rel < 2^24 are exact in f32), and the cross-block
        # "next free position" carry is itself a BIT (at m_last + k - 4k),
        # so in-step masking is mask = carry_bit - 1 — no per-lane variable
        # shifts and a single dynamic row read per step (the previous
        # formulation read k rows and ran ceil(L/k) steps; this is the
        # dominant kernel stage per scripts/exp_kernel_timing.py).
        BL = 4 * k
        W4 = (L + BL - 1) // BL
        bi4 = jax.lax.broadcasted_iota(jnp.int32, (W4, L), 0)
        ji4 = jax.lax.broadcasted_iota(jnp.int32, (W4, L), 1)
        rel4 = ji4 - bi4 * BL
        in_blk = (rel4 >= 0) & (rel4 < BL)
        w4 = jnp.where(
            in_blk, jnp.left_shift(1, jnp.where(in_blk, rel4, 0)), 0
        ).astype(jnp.float32)
        # default MXU precision is exact: weights are powers of two (exact
        # in bf16), match is 0/1, and the f32 accumulation sums DISTINCT
        # powers of two < 2^24 (each bit position occurs once per block)
        bits = jnp.dot(w4, match.astype(jnp.float32),
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        match_s[:W4, :] = bits
        # statically unrolled block loop (the former fori_loop + dynamic
        # scratch reads serialized all five ks; with static slices the five
        # independent per-k chains interleave in the scheduler)
        count = jnp.zeros((1, TB), jnp.int32)
        carry = jnp.zeros((1, TB), jnp.int32)
        for b in range(W4):
            row = match_s[b:b + 1, :]
            bq = jnp.maximum(carry, 1)  # carry==0 -> no constraint (q=0)
            avail = row & ~(bq - 1)
            last = jnp.zeros((1, TB), jnp.int32)
            for _ in range(4):
                lsb = avail & (-avail)
                taken = avail != 0
                count = count + taken.astype(jnp.int32)
                last = jnp.where(taken, lsb, last)
                avail = avail & ~((lsb << k) - lsb)  # clear m..m+k-1
            carry = (last << k) >> BL  # bit at m_last + k - 4k (0 if none)
        per_k.append((kcount, count, modal_eff))

    # --- k-selection state machine (utils.nim:243-269) ---------------------
    best = jnp.full((1, TB), -1, jnp.int32)
    done = jnp.zeros((1, TB), jnp.bool_)
    res_ki = jnp.full((1, TB), -1, jnp.int32)
    res_cnt = jnp.zeros((1, TB), jnp.int32)
    res_code = jnp.zeros((1, TB), jnp.int32)
    for ki, k in enumerate(KS):
        kcount, exact, modal_eff = per_k[ki]
        te_row = te_ref[ki, :].reshape(1, TB).astype(jnp.int32)
        tp_row = tp_ref[ki, :].reshape(1, TB).astype(jnp.int32)
        score_est = kcount * k
        gate1_fail = score_est <= best
        newly_done = (~done) & gate1_fail & (kcount < te_row)
        proceed = (~done) & (~gate1_fail)
        done = done | newly_done
        score_ex = exact * k
        upd = proceed & (score_ex >= best)
        best = jnp.where(upd, score_ex, best)
        set_res = upd & (exact > tp_row)
        res_ki = jnp.where(set_res, ki, res_ki)
        res_cnt = jnp.where(set_res, exact, res_cnt)
        res_code = jnp.where(set_res, modal_eff, res_code)

    klen = jnp.where(res_ki >= 0, res_ki + 2, 0)
    # homopolymer reduction (utils.nim:220-233): all base-4 digits equal
    first_digit = res_code & 3
    is_homo = res_ki >= 0
    for d in range(1, 6):
        active = d < klen
        dig = (res_code >> (2 * d)) & 3
        is_homo = is_homo & (~active | (dig == first_digit))
    res_cnt = jnp.where(is_homo, res_cnt * klen, res_cnt)
    res_code = jnp.where(is_homo, first_digit, res_code)
    klen = jnp.where(is_homo & (klen > 0), 1, klen)

    res_cnt = jnp.where(skip, 0, res_cnt)
    klen = jnp.where(skip, 0, klen)
    res_code = jnp.where(skip, 0, res_code)

    code_out[...] = res_code
    len_out[...] = klen
    cnt_out[...] = res_cnt


def get_repeat_codes_pallas(bases_T: jnp.ndarray, lengths: jnp.ndarray,
                            te: jnp.ndarray, tp: jnp.ndarray,
                            interpret: bool = False, variant: str = "full",
                            packed: bool = False):
    """bases_T: [L, B] uint8 (position-major) — or, with `packed`, the
    2-bit packed rows [L/4, B] of an N-free batch; lengths [B]; te/tp [5, B].

    Returns (unit_code [B] i32 base-4, unit_len [B] i32, count [B] i32).
    `variant` != "full" builds stage-disabled kernels for the attribution
    experiment only (scripts/exp_kernel_timing.py).
    """
    from functools import partial as _partial

    Lin, B = bases_T.shape
    L = 4 * Lin if packed else Lin
    assert B % TILE_B == 0, B
    grid = (B // TILE_B,)
    kern = (_partial(_kernel, variant=variant, packed=packed)
            if (variant != "full" or packed) else _kernel)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Lin, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((len(KS), TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((len(KS), TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L // 8 + 2, TILE_B), jnp.int32),  # greedy block bits
            pltpu.VMEM((max(1, L // 3), TILE_B // 2), jnp.int32),  # packed ne totals
        ],
        interpret=interpret,
    )(bases_T, lengths.reshape(1, B), te, tp)
    return out[0][0], out[1][0], out[2][0]


#: grids beyond 32 tiles have shown pathological Mosaic compile times on the
#: remote service, so larger batches run as a chain of <=32-tile pallas
#: calls inside one jit (one transfer, one result — the tunnel-round-trip
#: cost per batch is what the big batches amortize).
MAX_TILES = 32


def get_repeat_device_pallas(bases, lengths, thresh_early, thresh_prop,
                             interpret: bool = False, variant: str = "full",
                             packed: bool = False):
    """Drop-in for ops.kmer.get_repeat_device (same [B, L] inputs — or, with
    `packed`, [B, L/4] 2-bit packed N-free rows), returning packed codes
    instead of ASCII: (unit_code, unit_len, count)."""
    B, L = bases.shape
    pad = (-B) % TILE_B
    if pad:
        bases = jnp.pad(bases, ((0, pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad))
        thresh_early = jnp.pad(thresh_early, ((0, pad), (0, 0)))
        thresh_prop = jnp.pad(thresh_prop, ((0, pad), (0, 0)))
    Bp = B + pad
    chunk = MAX_TILES * TILE_B
    outs = []
    for s in range(0, Bp, chunk):
        e = min(s + chunk, Bp)
        outs.append(get_repeat_codes_pallas(
            bases[s:e].T, lengths[s:e],
            thresh_early[s:e].T.astype(jnp.int32),
            thresh_prop[s:e].T.astype(jnp.int32), interpret=interpret,
            variant=variant, packed=packed,
        ))
    code, klen, cnt = (jnp.concatenate([o[i] for o in outs])
                       if len(outs) > 1 else outs[0][i]
                       for i in range(3))
    if pad:
        code, klen, cnt = code[:B], klen[:B], cnt[:B]
    return code, klen, cnt


_pallas_jit = jax.jit(get_repeat_device_pallas)


@jax.jit
def _pallas_packed_jit(packed, nbits, lengths, te, tp):
    """2-bit packed transfer variant: device-side ASCII reconstruction (XLA,
    fused) feeding the unchanged kernel. See ops.kmer.pack_bases."""
    from strling_tpu.ops.kmer import unpack_ascii

    return get_repeat_device_pallas(unpack_ascii(packed, nbits), lengths, te, tp)


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnums=(1,))
def _pallas_fused_jit(payload, layout):
    """Single-transfer variant: one u8 payload in, one packed [B] i32 out.
    See ops.kmer.fuse_payload for the layouts and the tunnel-cost
    rationale. `layout` is static ("w8"/"w16"/"n8"). The n8 layout (N-free,
    the common case) skips ASCII reconstruction entirely: the kernel takes
    the 2-bit packed rows directly (4x smaller transpose; the band matmuls
    absorb the phase-block position permutation)."""
    from strling_tpu.ops.kmer import (
        FUSE_META8,
        _meta_from_payload,
        pack_result,
        unfuse_payload,
    )

    if layout == "n8":
        R, Wp = payload.shape
        L = (Wp - FUSE_META8) * 4
        pb = jax.lax.slice(payload, (0, 0), (R, L // 4))
        lengths, te, tp = _meta_from_payload(payload, L // 4, FUSE_META8)
        code, ulen, cnt = get_repeat_device_pallas(pb, lengths, te, tp,
                                                   packed=True)
        return pack_result(code, ulen, cnt)
    bases, lengths, te, tp = unfuse_payload(payload, layout)
    code, ulen, cnt = get_repeat_device_pallas(bases, lengths, te, tp)
    return pack_result(code, ulen, cnt)


def unpack_unit_codes(code: np.ndarray, klen: np.ndarray) -> list[str]:
    """Base-4 packed unit code -> ACTG string (host-side)."""
    DEC = "ACTG"
    out = []
    for c, l in zip(code.tolist(), klen.tolist()):
        out.append(
            "".join(DEC[(c >> (2 * (l - 1 - i))) & 3] for i in range(l))
        )
    return out
