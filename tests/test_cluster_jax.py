"""Device twins: JAX cluster segmentation and the batched genotyper model
against their scalar specs."""

import math

import numpy as np

from strling_tpu.core.cluster_batched import segment_group
from strling_tpu.core.genotyper import anchored_lm, unplaced_est
from strling_tpu.ops.cluster_jax import segment_ids
from strling_tpu.ops.genotyper_jax import (
    genotype_model_batch,
    unplaced_model_batch,
)


def _ids_from_segs(segs, n):
    ids = np.empty(n, np.int32)
    for k, (a, b) in enumerate(segs):
        ids[a:b] = k
    return ids


def test_segment_ids_matches_host_fuzz():
    rng = np.random.default_rng(29)
    for trial in range(25):
        n_clumps = int(rng.integers(1, 8))
        pos = []
        for _ in range(n_clumps):
            c = int(rng.integers(0, 3_000_000))
            pos.extend(c + rng.integers(0, 1500, int(rng.integers(1, 40))))
        pos = np.sort(np.array(pos, np.int64))
        max_dist = int(rng.choice([150, 400, 650]))
        want = _ids_from_segs(segment_group(pos, max_dist), len(pos))
        got = segment_ids(pos, max_dist)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_segment_ids_single_and_boundary():
    # one read; exact-threshold boundary cases around the 9-read freeze
    np.testing.assert_array_equal(segment_ids(np.array([5]), 300), [0])
    pos = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 404, 405, 2000], np.int64)
    max_dist = 300  # D = 400: pos[3]+400 = 403 -> 404 > thr8? boundary
    want = _ids_from_segs(segment_group(pos, max_dist), len(pos))
    np.testing.assert_array_equal(segment_ids(pos, max_dist), want)
    pos2 = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 403, 404, 804, 2000], np.int64)
    want2 = _ids_from_segs(segment_group(pos2, max_dist), len(pos2))
    np.testing.assert_array_equal(segment_ids(pos2, max_dist), want2)


def test_genotype_model_matches_scalar():
    rng = np.random.default_rng(7)
    ssc = rng.integers(0, 3000, 500)
    depth = rng.uniform(0.5, 80.0, 500).round(1)
    rulen = rng.integers(1, 7, 500)
    got = genotype_model_batch(ssc, depth, rulen)
    for i in range(500):
        want = anchored_lm(int(ssc[i]), float(depth[i])) / max(1, int(rulen[i]))
        if math.isnan(want):
            assert math.isnan(got[i])
        else:
            # XLA log2/exp2 differ from libm by a few ulps (observed ~16)
            # — ~1e-13 relative, far below the genotype file's 2-decimal
            # output precision
            assert got[i] == want or abs(got[i] - want) <= 64 * np.spacing(want)


def test_unplaced_model_matches_scalar():
    rng = np.random.default_rng(9)
    unp = rng.integers(3, 500, 200)
    depth = rng.uniform(1.0, 60.0, 200).round(1)
    rulen = rng.integers(1, 7, 200)
    got = unplaced_model_batch(unp, depth, rulen)
    for i in range(200):
        want = unplaced_est(int(unp[i]), float(depth[i])) / int(rulen[i])
        assert got[i] == want or abs(got[i] - want) <= 64 * np.spacing(want)
