"""Distributed (chromosome-sharded) extract vs single-process extract.

The only coupling between chromosome shards is read pairs whose mates map
to different chromosomes; these are spilled by the sharded engine and
resolved by pair_spills with the reference's pairing sequence
(extract.nim:192-248). The combined tread MULTISET must equal the
single-process result exactly."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from strling_tpu.core.extract import extract, extract_native
from strling_tpu.io.bam import Bam
from strling_tpu.io.bamwrite import BamRecord, write_bam
from strling_tpu.io.extract_native import NativeExtractor, native_frag_hist
from strling_tpu.parallel.extract_dist import pair_spills
from strling_tpu.utils import fraglen
from strling_tpu.utils.options import Options

HEADER = (
    "@HD\tVN:1.6\tSO:coordinate\n"
    "@SQ\tSN:chr1\tLN:1000000\n@SQ\tSN:chr2\tLN:1000000\n"
)
TARGETS = [("chr1", 1000000), ("chr2", 1000000)]


def _fixture_bam(path):
    rng = np.random.default_rng(11)
    alphabet = np.array(list("ACGT"))

    def rand_seq(n):
        return "".join(alphabet[rng.integers(0, 4, n)])

    recs = []
    # background proper pairs on both chroms (frag dist)
    for tid in (0, 1):
        for i in range(200):
            pos = 1000 + i * 31
            isz = 350 + int(rng.integers(-30, 30))
            mpos = pos + isz - 100
            q = f"bg{tid}_{i}"
            recs.append(BamRecord(q, 99, tid, pos, 60, "100M", tid, mpos, isz,
                                  rand_seq(100)))
            recs.append(BamRecord(q, 147, tid, mpos, 60, "100M", tid, pos,
                                  -isz, rand_seq(100)))
    # same-chrom STR pair (in-shard control): anchor + pure-CAG mate
    recs.append(BamRecord("loc1", 97, 0, 50000, 60, "100M", 0, 50250, 350,
                          rand_seq(100)))
    recs.append(BamRecord("loc1", 145, 0, 50250, 0, "100M", 0, 50000, -350,
                          "CAG" * 33 + "C"))
    # CROSS-chrom pair: well-mapped anchor on chr1, repeat read on chr2
    # (mapq 0, discordant) -> adjust_by must relocate it to chr1
    recs.append(BamRecord("x1", 0x61, 0, 60000, 60, "100M", 1, 70000, 0,
                          rand_seq(100)))
    recs.append(BamRecord("x1", 0x91, 1, 70000, 0, "100M", 0, 60000, 0,
                          "GAA" * 33 + "G"))
    # CROSS-chrom pair, both STR-like and low mapq -> unplaced_pair path
    recs.append(BamRecord("x2", 0x61, 0, 80000, 3, "100M", 1, 90000, 0,
                          "AT" * 50))
    recs.append(BamRecord("x2", 0x91, 1, 90000, 2, "100M", 0, 80000, 0,
                          "TA" * 50))
    # cross-chrom pair with NO str evidence on either side (anchor-only
    # spill traffic; must produce nothing)
    recs.append(BamRecord("x3", 0x61, 0, 85000, 60, "100M", 1, 95000, 0,
                          rand_seq(100)))
    recs.append(BamRecord("x3", 0x91, 1, 95000, 60, "100M", 0, 85000, 0,
                          rand_seq(100)))
    # soft-clipped STR read on chr2 whose mate is on chr1 (clip treads must
    # still come out of the sharded run)
    recs.append(BamRecord("x4", 99, 0, 88000, 60, "100M", 1, 97000, 0,
                          rand_seq(100)))
    recs.append(BamRecord("x4", 147, 1, 97000, 60, "60S40M", 0, 88000, 0,
                          "CAG" * 20 + rand_seq(40)))
    # unplaced pair (no-coor block, owned by shard 0)
    recs.append(BamRecord("unp1", 77, -1, -1, 0, "*", -1, -1, 0,
                          "GAA" * 33 + "G"))
    recs.append(BamRecord("unp1", 141, -1, -1, 0, "*", -1, -1, 0,
                          "TTC" * 33 + "T"))
    recs.sort(key=lambda r: (r.tid if r.tid >= 0 else 1 << 30, r.pos))
    write_bam(path, HEADER, TARGETS, recs)


@pytest.fixture(scope="module")
def dist_bam(tmp_path_factory):
    p = tmp_path_factory.mktemp("exd") / "dist.bam"
    _fixture_bam(str(p))
    return str(p)


def _key(t):
    return (t.tid, t.position, t.repeat, t.flag, int(t.split),
            t.mapping_quality, t.repeat_count, t.align_length, t.qname)


def _multiset(treads):
    return sorted(_key(t) for t in treads)


def _sharded_in_process(bam_path, shards):
    """Run N sharded engines in one process and combine like
    run_extract_dist (shards = list of tid lists; first owns no-coor),
    including the emission-key sort that reproduces sequential order."""
    from strling_tpu.parallel.extract_dist import _keys_struct

    frag = native_frag_hist(Bam(bam_path))
    med = fraglen.median(frag)
    opts = Options(median_fragment_length=med, proportion_repeat=0.8,
                   min_mapq=40)
    parts, spills = [], []
    for si, tids in enumerate(shards):
        ne = NativeExtractor(Bam(bam_path), 0.8, 40, med)
        ne.set_shard(tids, include_unplaced=(si == 0))
        parts.append((ne.run(), _keys_struct(ne.emission_keys(0))))
        spills.append((ne.spill(), _keys_struct(ne.emission_keys(1))))
    extra, extra_keys = pair_spills(spills, opts)
    combined = [t for p, _ in parts for t in p.to_treads()] + extra
    keys = np.concatenate([k for _, k in parts] + [extra_keys])
    order = np.lexsort((keys["ksub"], keys["krank"], keys["ktid"],
                        keys["seg"]))
    return [combined[i] for i in order]


def test_sharded_equals_single(dist_bam):
    tb_single, _, _ = extract_native(Bam(dist_bam), None, None)
    combined = _sharded_in_process(dist_bam, [[0], [1]])
    # emission-key sort makes the order EXACTLY the sequential order
    assert [_key(t) for t in combined] == [
        _key(t) for t in tb_single.to_treads()]
    # the cross-chrom evidence must actually be present
    qnames = {t.qname for t in combined}
    assert {"x1", "x2", "x4", "loc1", "unp1"} <= qnames


def test_sharded_one_shard_owns_all(dist_bam):
    tb_single, _, _ = extract_native(Bam(dist_bam), None, None)
    combined = _sharded_in_process(dist_bam, [[0, 1]])
    assert [_key(t) for t in combined] == [
        _key(t) for t in tb_single.to_treads()]


def test_sharded_three_way_with_empty_shard(dist_bam):
    tb_single, _, _ = extract_native(Bam(dist_bam), None, None)
    combined = _sharded_in_process(dist_bam, [[0], [1], []])
    assert [_key(t) for t in combined] == [
        _key(t) for t in tb_single.to_treads()]


def test_multi_device_round_robin_identical(dist_bam):
    """Round-robin over the 8 virtual CPU devices must be byte-identical."""
    import jax

    tb1, _, _ = extract_native(Bam(dist_bam), None, None)
    tb8, _, _ = extract_native(Bam(dist_bam), None, None, devices="all")
    assert len(jax.local_devices()) >= 2
    assert [_key(t) for t in tb8.to_treads()] == [
        _key(t) for t in tb1.to_treads()
    ]


WORKER = textwrap.dedent("""
    import os, sys
    pid, n, port, out_bin, bam = sys.argv[1:6]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=int(n), process_id=int(pid))
    from strling_tpu.parallel.extract_dist import run_extract_dist
    run_extract_dist(bam, output_bin=out_bin)
""")


def test_two_process_distributed_extract(dist_bam, tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_bin = str(tmp_path / "dist.bin")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", "12671", out_bin,
             dist_bam],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]

    from strling_tpu.io.binfmt import read_bin

    got = read_bin(out_bin)
    tb_single, frag_single, _ = extract_native(Bam(dist_bam), None, None)
    np.testing.assert_array_equal(got.fragment_distribution, frag_single)
    # all extract modes now produce byte-identical bin artifacts
    from strling_tpu.io.binfmt import write_bin

    single_bin = str(tmp_path / "single.bin")
    write_bin(single_bin, tb_single, frag_single,
              Bam(dist_bam).header_text, 0.8, 40)
    assert open(out_bin, "rb").read() == open(single_bin, "rb").read()
