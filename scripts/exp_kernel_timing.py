"""Stage-toggle timing for the Pallas repeat-scan kernel (experiment tool).

Compiles variants of the kernel with stages disabled to attribute time:
  full      - the real kernel
  no_greedy - exact recount replaced by kcount (skips the L-step fori loops)
  no_modal  - modal count replaced by first valid window code
  encode_only - window min-rotation codes only

Usage: python scripts/exp_kernel_timing.py [--variants full,no_greedy,...]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from strling_tpu.ops.kmer import KS, _host_thresholds  # noqa: E402

TILE_B = 1024
NEG = -1


def make_kernel(variant: str):
    do_modal = variant in ("full", "no_greedy")
    do_greedy = variant in ("full", "no_modal")
    do_select = variant != "encode_only"

    def _kernel(bases_ref, lengths_ref, te_ref, tp_ref, code_out, len_out,
                cnt_out, codes_s, wmin_s, match_s):
        L, TB = bases_ref.shape
        basesi = bases_ref[...].astype(jnp.int32)
        codes = (basesi >> 1) & 3
        codes_s[:, :] = codes
        lengths = lengths_ref[...].astype(jnp.int32)
        n_mask = (basesi == ord("N")) & (
            jax.lax.broadcasted_iota(jnp.int32, (L, TB), 0) < lengths
        )
        skip = n_mask.astype(jnp.int32).sum(axis=0, keepdims=True) > 20

        per_k = []
        for ki, k in enumerate(KS):
            W = L // k
            mask = (1 << (2 * k)) - 1

            def win_body(j, _):
                f = jnp.zeros((1, TB), jnp.int32)
                for m in range(k):
                    f = ((f << 2) | codes_s[pl.ds(j * k + m, 1), :]) & mask
                kmin = f
                for m in range(k):
                    f = ((f << 2) | codes_s[pl.ds(j * k + m, 1), :]) & mask
                    kmin = jnp.minimum(kmin, f)
                wmin_s[pl.ds(j, 1), :] = kmin
                return 0

            jax.lax.fori_loop(0, W, win_body, 0)
            wmin = wmin_s[:W, :]
            win_end = (jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0) + 1) * k
            validw = win_end <= lengths
            wmin = jnp.where(validw, wmin, NEG)
            widx = jax.lax.broadcasted_iota(jnp.int32, (W, TB), 0)

            if not do_modal:
                modal = jnp.max(jnp.where(validw, wmin, NEG), axis=0, keepdims=True)
                kcount = jnp.where(modal >= 0, 1, 0)
            elif k == 2:
                M = jnp.zeros((1, TB), jnp.int32)
                best_last = jnp.full((1, TB), W, jnp.int32)
                modal = jnp.full((1, TB), NEG, jnp.int32)
                for v in range(1 << (2 * k)):
                    eq = wmin == v
                    tot = eq.astype(jnp.int32).sum(axis=0, keepdims=True)
                    last = jnp.max(jnp.where(eq, widx, -1), axis=0, keepdims=True)
                    better = (tot > M) | ((tot == M) & (tot > 0) & (last < best_last))
                    M = jnp.where(better, tot, M)
                    best_last = jnp.where(better, last, best_last)
                    modal = jnp.where(better, v, modal)
                kcount = jnp.where(modal >= 0, M, 0)
            else:
                wmin_s[:W, :] = wmin

                def modal_body(i, carry):
                    total, lastmax = carry
                    row = wmin_s[pl.ds(i, 1), :]
                    eq = wmin == row
                    total = total + eq.astype(jnp.int32)
                    lastmax = jnp.maximum(lastmax, jnp.where(eq, i, -1))
                    return total, lastmax

                total, lastmax = jax.lax.fori_loop(
                    0, W, modal_body,
                    (jnp.zeros((W, TB), jnp.int32), jnp.full((W, TB), -1, jnp.int32)),
                )
                M = jnp.max(jnp.where(validw, total, 0), axis=0, keepdims=True)
                cand = validw & (total == M) & (lastmax == widx) & (M > 0)
                jstar = jnp.min(jnp.where(cand, widx, W), axis=0, keepdims=True)
                sel = cand & (widx == jstar)
                modal = jnp.max(jnp.where(sel, wmin, NEG), axis=0, keepdims=True)
                kcount = jnp.where(modal >= 0, M, 0)
            modal_eff = jnp.where(modal < 0, (1 << (2 * k)) - 1, modal)

            if do_greedy:
                kmer_rows = []
                for m in range(k):
                    digit = (modal_eff >> (2 * (k - 1 - m))) & 3
                    kmer_rows.append(65 + 2 * digit + 15 * (digit == 2).astype(jnp.int32))
                match = jnp.ones((L, TB), dtype=jnp.bool_)
                for m in range(k):
                    shifted = jax.lax.slice(basesi, (m, 0), (L, TB))
                    shifted = jnp.pad(shifted, ((0, m), (0, 0)))
                    match = match & (shifted == kmer_rows[m])
                jpos = jax.lax.broadcasted_iota(jnp.int32, (L, TB), 0)
                match = match & ((jpos + k) <= lengths)
                match_s[:, :] = match.astype(jnp.int32)

                def greedy_body(j, carry):
                    count, next_free = carry
                    mj = match_s[pl.ds(j, 1), :]
                    can = (mj > 0) & (j >= next_free)
                    count = count + can.astype(jnp.int32)
                    next_free = jnp.where(can, j + k, next_free)
                    return count, next_free

                exact, _ = jax.lax.fori_loop(
                    0, L, greedy_body,
                    (jnp.zeros((1, TB), jnp.int32), jnp.zeros((1, TB), jnp.int32)),
                )
            else:
                exact = kcount
            per_k.append((kcount, exact, modal_eff))

        if do_select:
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
        else:
            res_code = per_k[0][2]
            res_cnt = per_k[0][0]
            klen = jnp.full((1, TB), 2, jnp.int32)

        res_cnt = jnp.where(skip, 0, res_cnt)
        klen = jnp.where(skip, 0, klen)
        res_code = jnp.where(skip, 0, res_code)
        code_out[...] = res_code
        len_out[...] = klen
        cnt_out[...] = res_cnt

    return _kernel


def build(variant, L, B):
    grid = (B // TILE_B,)
    kern = make_kernel(variant)

    def fn(bases_T, lengths, te, tp):
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((L, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
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
                pltpu.VMEM((L, TILE_B), jnp.int32),
                pltpu.VMEM((L // 2, TILE_B), jnp.int32),
                pltpu.VMEM((L, TILE_B), jnp.int32),
            ],
        )(bases_T, lengths, te, tp)

    return jax.jit(fn)


def main():
    variants = ["full", "no_greedy", "no_modal", "encode_only"]
    for a in sys.argv[1:]:
        if a.startswith("--variants="):
            variants = a.split("=", 1)[1].split(",")
    B, L = 32768, 152
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    bases_np = alphabet[rng.integers(0, 4, (B, L))]
    units = [b"CAG", b"A", b"AT", b"AAGGG", b"ATTCT"]
    for i in range(0, B, 10):
        u = units[i % len(units)]
        bases_np[i] = np.frombuffer((u * (L // len(u) + 1))[:L], np.uint8)
    lengths_np = np.full(B, L, np.int32)
    te, tp = _host_thresholds(lengths_np, np.full(B, 0.8))

    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    bT = jax.device_put(np.ascontiguousarray(bases_np.T), dev)
    ln = jax.device_put(lengths_np.reshape(1, B), dev)
    ted = jax.device_put(np.ascontiguousarray(te.T.astype(np.int32)), dev)
    tpd = jax.device_put(np.ascontiguousarray(tp.T.astype(np.int32)), dev)

    for v in variants:
        fn = build(v, L, B)
        t0 = time.perf_counter()
        out = fn(bT, ln, ted, tpd)
        np.asarray(out[2])
        tc = time.perf_counter() - t0
        # slope timing: fixed fetch latency cancels
        def run(iters):
            t0 = time.perf_counter()
            outs = [fn(bT, ln, ted, tpd) for _ in range(iters)]
            np.asarray(outs[-1][2])
            return time.perf_counter() - t0
        run(3)
        t1 = min(run(5) for _ in range(3))
        t2 = min(run(25) for _ in range(3))
        per = (t2 - t1) / 20
        print(f"{v:12s} compile+first={tc:6.1f}s per_batch={per*1e3:7.2f}ms "
              f"reads/s={B/per/1e6:7.2f}M")


if __name__ == "__main__":
    main()
