"""Clustering/bounds tests ported from reference tests/test_cluster.nim."""

import numpy as np
import pytest

from strling_tpu.core.cluster import (
    Bounds,
    Cluster,
    bounds,
    cluster,
    parse_bed,
    parse_bedline,
    parse_bounds,
    parse_boundsline,
    trcluster,
)
from strling_tpu.core.tread import TREAD_DTYPE, Soft


class T:
    def __init__(self, name, tid=0, length=10000):
        self.name, self.tid, self.length = name, tid, length


def mk(reads):
    """reads: list of (tid, repeat, position, split[, mapq])."""
    arr = np.zeros(len(reads), TREAD_DTYPE)
    for i, r in enumerate(reads):
        arr[i]["tid"] = r[0]
        arr[i]["repeat"] = r[1].encode()
        arr[i]["position"] = r[2]
        arr[i]["split"] = int(r[3])
        if len(r) > 4:
            arr[i]["mapping_quality"] = r[4]
    return arr


def test_bounds_equal():
    assert Bounds(tid=0, left=1, right=100) == Bounds(tid=0, left=1, right=100)
    assert Bounds(tid=0, left=1, right=100) != Bounds(tid=0, left=2, right=100)


def test_bounds_overlap():
    a = Bounds(tid=0, left=1, right=100)
    assert a.overlaps(Bounds(tid=0, left=50, right=100))
    assert not a.overlaps(Bounds(tid=0, left=200, right=300))


def test_clustering():
    # test_cluster.nim:38-55
    reads = mk(
        [(1, "AAAAAT", p, Soft.none) for p in (1, 1, 1, 200, 255)]
    )
    out = list(cluster(reads, 125, min_supporting_reads=3))
    assert len(out) == 1
    cl = out[0]
    assert len(cl.reads) == 4
    assert cl.tostring([T("chr0"), T("chr1", 1)]) == "chr1\t1\t200\t4\tAAAAAT"


def test_bounds_clips():
    # test_cluster.nim:58-79
    reads = mk(
        [(1, "ATG", 123, Soft.none)] * 2
        + [(1, "ATG", 223, Soft.left)] * 4
        + [(1, "ATG", 253, Soft.right)] * 4
        + [(1, "ATG", 283, Soft.none)]
    )
    b = bounds(Cluster(reads=reads))
    assert (b.left, b.right, b.left_most, b.right_most) == (223, 253, 123, 283)


def test_bounds_no_clips_median():
    # test_cluster.nim:81-91
    reads = mk([(1, "ATG", p, Soft.none) for p in (1, 2, 5)])
    b = bounds(Cluster(reads=reads))
    assert (b.left, b.right) == (2, 3)


def test_bounds_no_right_clips():
    # test_cluster.nim:93-105
    reads = mk(
        [(1, "ATG", 1, Soft.left), (1, "ATG", 1, Soft.left)]
        + [(1, "ATG", p, Soft.none) for p in (2, 3, 5)]
    )
    b = bounds(Cluster(reads=reads))
    assert (b.left, b.right) == (1, 2)


def test_bounds_no_left_clips():
    # test_cluster.nim:107-118
    reads = mk(
        [(1, "ATG", 2, Soft.none), (1, "ATG", 2, Soft.none),
         (1, "ATG", 3, Soft.right), (1, "ATG", 5, Soft.none)]
    )
    b = bounds(Cluster(reads=reads))
    assert (b.left, b.right) == (3, 4)


def test_bounds_filters_inconsistent_clips():
    # test_cluster.nim:120-138
    reads = mk(
        [(1, "ATG", 100, Soft.right), (1, "ATG", 123, Soft.none)]
        + [(1, "ATG", 223, Soft.none)] * 3
        + [(1, "ATG", 253, Soft.none), (1, "ATG", 283, Soft.none)]
    )
    b = bounds(Cluster(reads=reads), max_clip_dist=50)
    assert (b.left, b.right, b.left_most, b.right_most, b.center_mass) == (
        223, 224, 100, 283, 223,
    )


def test_inverted_bounds():
    # test_cluster.nim:188-196
    reads = mk(
        [(20, "TT", p, Soft.none, q) for p, q in [
            (48086080, 0), (48086101, 15), (48086132, 0),
            (48086164, 0), (48086187, 0), (48086281, 0)]]
    )
    b = bounds(Cluster(reads=reads))
    assert b.left < b.right


def test_should_split_cluster():
    # test_cluster.nim:200-228
    reads = mk(
        [(0, "", 370, Soft.none)]
        + [(0, "", 391, Soft.right)] * 3
        + [(0, "", 403, Soft.none), (0, "", 503, Soft.none)]
        + [(0, "", 850, Soft.left)] * 4
        + [(0, "", 880, Soft.none)]
    )
    clusters = list(trcluster(reads, 500, 1))
    assert len(clusters) == 2
    c1, c2 = clusters
    assert len(c1.reads) == 6
    assert c1.reads["position"][-1] == 503
    assert len(c2.reads) == 5
    assert c2.reads["position"][0] == 850


def test_inverted_bounds_again():
    # test_cluster.nim:231-242
    reads = mk(
        [(11, "", p, s) for p, s in [
            (115977335, Soft.none), (115977397, Soft.none),
            (115977419, Soft.none), (115977448, Soft.left),
            (115977585, Soft.none), (115977598, Soft.none)]]
    )
    b = bounds(Cluster(reads=reads))
    assert b.left < b.right


def test_inverted_bounds_3():
    # test_cluster.nim:244-252
    reads = mk(
        [(10, "", p, s) for p, s in [
            (92611809, Soft.none), (92611833, Soft.right),
            (92611833, Soft.right), (92611921, Soft.none),
            (92611939, Soft.none)]]
    )
    b = bounds(Cluster(reads=reads))
    assert b.left < b.right


def test_right_most_bug():
    # test_cluster.nim:254-268
    reads = mk(
        [(5, "", p, s) for p, s in [
            (34847227, Soft.left), (34847227, Soft.none),
            (34847883, Soft.left), (34847911, Soft.none),
            (34847921, Soft.left), (34847921, Soft.left),
            (34847930, Soft.none),
            (34848950, Soft.left), (34848950, Soft.left),
            (34848950, Soft.left)]]
    )
    b = bounds(Cluster(reads=reads))
    assert b.left < b.right


def test_parse_bedline():
    # test_cluster.nim:151-161
    targets = [T("chr1")]
    b = parse_bedline("chr1 100 200 CAG", targets, 50)
    assert (b.tid, b.left, b.left_most, b.right, b.right_most, b.repeat) == (
        0, 100, 50, 200, 250, "CAG",
    )


def test_parse_bed(tmp_path):
    f = tmp_path / "test_str_parse.bed"
    f.write_text("chr1 1 100 CAG\nchr1 1 100 CAG")
    assert parse_bed(str(f), [T("chr1")], 100)[1].tid == 0


def test_parse_boundsline():
    l = "chr1\t990\t1010\tCAG\t\t500\t1500\t1000\t3\t1\t50"
    b = parse_boundsline(l, [T("chr1")])
    assert (b.tid, b.left, b.right, b.repeat) == (0, 990, 1010, "CAG")


def test_parse_bounds(tmp_path):
    f = tmp_path / "test_str_parse-bounds.txt"
    l = "chr1\t990\t1010\tCAG\t\t500\t1500\t1000\t3\t1\t50"
    f.write_text(l + "\n" + l)
    assert parse_bounds(str(f), [T("chr1")])[1].tid == 0


def test_unplaced_cluster_single():
    reads = mk([(-1, "AAG", 0, Soft.none)] * 7)
    out = list(cluster(reads, 500, 5))
    assert len(out) == 1 and len(out[0].reads) == 7


def test_largest_tie_goes_to_first_reaching_max():
    """Vectorized _largest must match the running-scan semantics: on a count
    tie the winner is the key whose M-th occurrence comes first (B in
    A B B A B A), not the key seen first."""
    from strling_tpu.core.cluster import _largest

    key, val = _largest([10, 20, 20, 10, 20, 10])
    assert (key, val) == (20, 3)
    key, val = _largest([7])
    assert (key, val) == (7, 1)
    key, val = _largest([5, 5, 9, 9])  # 5 reaches 2 first
    assert (key, val) == (5, 2)
