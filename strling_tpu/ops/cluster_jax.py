"""Cluster segmentation on device: the SURVEY §7 L3 formulation in JAX.

The reference's greedy grow loop (cluster.nim:323-352) looks inherently
sequential, but its median window freezes after 9 reads, so one cluster
costs at most 8 scalar accept steps plus two sorted-array jumps — a
bounded-iteration body. This module expresses that as a single
`lax.while_loop` over clusters inside one jit: the whole position-sorted
(tid, repeat) group segments in one device dispatch, returning per-read
segment ids.

Exactness: identical boundaries to core/cluster_batched.segment_group
(itself fuzz-verified against the scalar trcluster) — asserted in
tests/test_cluster_jax.py. The host segmented pipeline remains production
for the CLI (one group's segmentation is microseconds of work — a device
round trip per group is the wrong placement single-chip), and this kernel
is the device form for mesh-resident pipelines and the parity artifact for
the north star's "clustering as segment operations over packed read
tensors".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("max_dist",))
def segment_ids_jax(positions: jnp.ndarray, n_valid: jnp.ndarray,
                    max_dist: int) -> jnp.ndarray:
    """Per-read cluster ids for one position-sorted group.

    positions: int64[N] sorted, padded beyond n_valid with a huge sentinel
    by the caller (or anything — rows >= n_valid get id -1).
    Returns int32[N] segment ids, -1 for padding.
    """
    N = positions.shape[0]
    pos = positions.astype(jnp.int64)
    D = jnp.int64(max_dist + 100)

    def cluster_body(state):
        a, seg_id, ids = state

        # stepwise growth, window sizes 1..8: accept pos[a+w] iff
        # <= pos[a + (w-1)//2] + D (threshold from the pre-accept window)
        def grow(w, b):
            # b == a + w when still growing, else frozen
            thr = pos[a + (w - 1) // 2] + D
            ok = (b == a + w) & (a + w < n_valid) & (pos[jnp.minimum(a + w, N - 1)] <= thr)
            return jnp.where(ok, a + w + 1, b)

        b = jax.lax.fori_loop(1, 9, grow, a + 1)

        def jumps(b):
            # reached size 9 via the last accept: the 8-median jump …
            thr8 = pos[a + 3] + D
            j1 = jnp.searchsorted(pos, thr8, side="right").astype(jnp.int64)
            b1 = jnp.maximum(jnp.minimum(j1, n_valid), b)
            # … then one frozen 9-median jump if the next read is close
            thr9 = pos[a + 4] + D
            nxt_ok = (b1 < n_valid) & (pos[jnp.minimum(b1, N - 1)] <= thr9)
            j2 = jnp.searchsorted(pos, thr9, side="right").astype(jnp.int64)
            b2 = jnp.maximum(jnp.minimum(j2, n_valid), b1 + 1)
            return jnp.where(nxt_ok, b2, b1)

        b = jnp.where(b - a == 9, jumps(b), b)
        idx = jnp.arange(N, dtype=jnp.int64)
        ids = jnp.where((idx >= a) & (idx < b), seg_id, ids)
        return b, seg_id + 1, ids

    def cond(state):
        a, _, _ = state
        return a < n_valid

    _, _, ids = jax.lax.while_loop(
        cond, cluster_body,
        (jnp.int64(0), jnp.int32(0), jnp.full(N, -1, jnp.int32)),
    )
    return ids


def segment_ids(positions: np.ndarray, max_dist: int,
                pad_to: int | None = None) -> np.ndarray:
    """Host wrapper: pad to a bucketed shape (bounded jit cache), run the
    device segmentation, return int32 ids for the valid rows."""
    n = len(positions)
    if n == 0:
        return np.zeros(0, np.int32)
    N = pad_to or max(256, 1 << int(np.ceil(np.log2(n))))
    pad = np.full(N - n, np.iinfo(np.int64).max // 4, np.int64)
    arr = np.concatenate([positions.astype(np.int64), pad])
    # positions are uint32 genomic coordinates and the pad sentinel must
    # stay far above any threshold — the kernel needs real 64-bit ints
    with jax.enable_x64(True):
        ids = segment_ids_jax(jnp.asarray(arr), jnp.int64(n), max_dist)
    return np.asarray(ids)[:n]
