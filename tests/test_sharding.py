"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from strling_tpu.ops.kmer import _host_thresholds, get_repeat_batch
from strling_tpu.parallel.extract_sharded import make_sharded_extract_step, N_UNIT_IDS
from strling_tpu.parallel.mesh import make_mesh


def _inputs(B, L, seed=0):
    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    bases = alphabet[rng.integers(0, 4, (B, L))]
    # plant CAG repeats in a quarter of reads
    for i in range(0, B, 4):
        bases[i] = np.frombuffer((b"CAG" * (L // 3 + 1))[:L], np.uint8)
    lengths = np.full(B, L, np.int32)
    te, tp = _host_thresholds(lengths, np.full(B, 0.8))
    isize = rng.integers(100, 800, B).astype(np.int32)
    frag_valid = np.ones(B, bool)
    return bases, lengths, te, tp, isize, frag_valid


@pytest.mark.parametrize("locus_axis", [False, True])
def test_sharded_extract_step(locus_axis):
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    mesh = make_mesh(locus_axis=locus_axis)
    step = make_sharded_extract_step(mesh)
    B, L = 64, 96
    bases, lengths, te, tp, isize, fv = _inputs(B, L)
    unit, unit_len, count, frag, uhist, n_str = step(bases, lengths, te, tp, isize, fv)

    # matches the single-device kernel
    u1, ul1, c1 = get_repeat_batch(bases, lengths, np.full(B, 0.8))
    np.testing.assert_array_equal(np.asarray(count), c1)
    np.testing.assert_array_equal(np.asarray(unit_len), ul1)
    np.testing.assert_array_equal(np.asarray(unit), u1)

    # psum'd histograms are global
    assert int(np.asarray(frag).sum()) == B
    assert int(np.asarray(uhist).sum()) == int((c1 > 0).sum())
    assert np.asarray(uhist).shape == (N_UNIT_IDS,)
    assert int(np.asarray(n_str).sum()) == int((c1 > 0).sum())


def test_mesh_shapes():
    m1 = make_mesh()
    assert m1.axis_names == ("data",) and m1.devices.size == 8
    m2 = make_mesh(locus_axis=True)
    assert m2.axis_names == ("data", "locus") and m2.devices.shape == (4, 2)
    m3 = make_mesh(n_devices=2)
    assert m3.devices.size == 2
