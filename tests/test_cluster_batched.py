"""Equivalence: cluster_batched (segmented production path) vs the scalar
spec pipeline cluster() + split_cluster + bounds_checked (core/cluster.py,
core/callclusters.py)."""

import numpy as np

from strling_tpu.core.callclusters import bounds_checked
from strling_tpu.core.cluster import cluster
from strling_tpu.core.cluster_batched import cluster_group_batched, segment_group
from strling_tpu.core.tread import TREAD_DTYPE, Soft


def _group(positions, splits, repeat=b"CAG", tid=0):
    data = np.zeros(len(positions), TREAD_DTYPE)
    data["tid"] = tid
    data["position"] = positions
    data["repeat"] = repeat
    data["split"] = splits
    data["repeat_count"] = 10
    data["align_length"] = 150
    order = np.argsort(data["position"], kind="stable")
    return data[order]


def _scalar(reads, max_dist, min_support, min_clip=0, min_clip_total=0,
            max_clip_dist=200, qnames=None):
    out = []
    for c in cluster(reads, max_dist=max_dist,
                     min_supporting_reads=min_support, qnames=qnames):
        b, good = bounds_checked(c, min_clip, min_clip_total, max_clip_dist)
        if not good:
            continue
        out.append((b, c.reads, c.qnames))
    return out


def _batched(reads, max_dist, min_support, min_clip=0, min_clip_total=0,
             max_clip_dist=200, qnames=None):
    return list(
        cluster_group_batched(reads, max_dist, min_support, min_clip,
                              min_clip_total, max_clip_dist, qnames)
    )


def _assert_same(got, want, ctx=""):
    assert len(got) == len(want), (ctx, len(got), len(want))
    for k, ((gb, gr, gq), (wb, wr, wq)) in enumerate(zip(got, want)):
        for f in ("tid", "left", "right", "left_most", "right_most",
                  "center_mass", "n_left", "n_right", "n_total", "repeat"):
            assert getattr(gb, f) == getattr(wb, f), (ctx, k, f)
        np.testing.assert_array_equal(gr, wr, err_msg=f"{ctx} cluster {k}")
        if wq is not None:
            np.testing.assert_array_equal(gq, wq, err_msg=f"{ctx} q {k}")


def test_segmentation_matches_scalar_fuzz():
    rng = np.random.default_rng(3)
    for trial in range(60):
        n_clumps = int(rng.integers(1, 8))
        pos = []
        for _ in range(n_clumps):
            c = int(rng.integers(0, 2_000_000))
            m = int(rng.integers(1, 40))
            pos.extend(c + rng.integers(0, 1200, m))
        pos = np.sort(np.array(pos, np.int64))
        max_dist = int(rng.integers(100, 800))
        segs = segment_group(pos, max_dist)
        # direct re-derivation with the scalar grow loop
        D = max_dist + 100
        want = []
        a = 0
        n = len(pos)
        while a < n:
            b = a + 1
            while b < n:
                w = min(9, b - a)
                thr = int(pos[a + (w - 1) // 2]) + D
                if pos[b] <= thr:
                    b += 1
                    if b - a >= 9:
                        b = max(int(np.searchsorted(pos, thr, "right")), b)
                else:
                    break
            want.append((a, b))
            a = b
        assert segs == want, (trial, max_dist)


def test_cluster_batched_matches_scalar_fuzz():
    rng = np.random.default_rng(17)
    for trial in range(40):
        n_clumps = int(rng.integers(1, 7))
        pos, spl = [], []
        for _ in range(n_clumps):
            c = int(rng.integers(1000, 3_000_000))
            m = int(rng.integers(1, 35))
            pos.extend(c + rng.integers(0, 900, m))
            spl.extend(rng.choice(
                [int(Soft.left), int(Soft.right), int(Soft.none),
                 int(Soft.none_left), int(Soft.none_right)],
                m, p=[0.25, 0.25, 0.3, 0.1, 0.1]))
        reads = _group(np.array(pos), np.array(spl))
        qn = np.array([f"q{i}" for i in range(len(reads))], object)
        max_dist = int(rng.integers(200, 700))
        ms = int(rng.integers(1, 8))
        mcd = int(rng.integers(50, 400))
        got = _batched(reads, max_dist, ms, max_clip_dist=mcd, qnames=qn)
        want = _scalar(reads, max_dist, ms, max_clip_dist=mcd, qnames=qn)
        _assert_same(got, want, ctx=f"trial {trial}")


def test_cluster_batched_split_case():
    # engineered double-locus cluster: right-clip peak left of left-clip peak
    right = [1000] * 6
    left = [1400] * 6
    anchors = list(range(900, 1500, 40))
    pos = np.array(right + left + anchors)
    spl = np.array([int(Soft.right)] * 6 + [int(Soft.left)] * 6
                   + [int(Soft.none)] * len(anchors))
    reads = _group(pos, spl)
    got = _batched(reads, 500, 5)
    want = _scalar(reads, 500, 5)
    assert len(want) == 2  # the split fires
    _assert_same(got, want)


def test_cluster_batched_trim_and_gap():
    # a stray early read that trim drops, then a dense cluster, then a gap
    pos = np.array([10] + list(range(50_000, 50_400, 25))
                   + list(range(90_000, 90_200, 30)))
    spl = np.full(len(pos), int(Soft.none))
    spl[1] = int(Soft.left)
    spl[2] = int(Soft.left)
    spl[-1] = int(Soft.right)
    reads = _group(pos, spl)
    for ms in (1, 2, 5):
        _assert_same(_batched(reads, 300, ms), _scalar(reads, 300, ms),
                     ctx=f"ms {ms}")


def test_cluster_batched_clip_gates():
    rng = np.random.default_rng(5)
    pos = 100_000 + rng.integers(0, 600, 30)
    spl = rng.choice([0, 1, 3], 30)
    reads = _group(np.sort(pos), spl[np.argsort(pos, kind="stable")])
    for mc, mct in ((0, 0), (2, 0), (0, 5), (3, 7)):
        _assert_same(
            _batched(reads, 400, 2, min_clip=mc, min_clip_total=mct),
            _scalar(reads, 400, 2, min_clip=mc, min_clip_total=mct),
            ctx=f"mc {mc} mct {mct}",
        )
