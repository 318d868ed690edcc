"""Multi-chip sharded extract step.

The distributed design (SURVEY.md §2 parallelism table): the read stream is
data-parallel across chips; per-chip partial statistics are combined with XLA
collectives over ICI —

- fragment-length histogram: psum (the reference's element-wise histogram sum
  at merge, merge.nim:112-115)
- per-repeat-unit evidence histogram: psum
- per-locus-shard candidate counts: all_gather over the "locus" axis (the
  reference's per-chromosome merge fan-out, merge.nim:89,125)

`extract_step` is the jittable whole-step used by the dryrun and benchmarks;
production extract uses the same kernel per host over its local chips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from strling_tpu.ops.kmer import KS, get_repeat_device


def unit_code(unit_ascii: jnp.ndarray, unit_len: jnp.ndarray) -> jnp.ndarray:
    """Encode a [B, 6] ASCII unit + length to a dense int id:
    offset(len) + base4-code. len 0 -> id 0 (no repeat)."""
    codes = (unit_ascii.astype(jnp.int32) >> 1) & 3
    # offsets: 1 + sum_{l<len} 4^l
    offs = np.zeros(8, np.int64)
    acc = 1
    for l in range(1, 8):
        offs[l] = acc
        acc += 4**l
    val = jnp.zeros(unit_ascii.shape[0], jnp.int32)
    for i in range(6):
        active = i < unit_len
        val = jnp.where(active, val * 4 + codes[:, i], val)
    return jnp.where(
        unit_len > 0, jnp.asarray(offs, jnp.int32)[unit_len] + val, 0
    )


N_UNIT_IDS = 1 + sum(4**l for l in range(1, 7))  # 5461


def extract_step_local(bases, lengths, thresh_early, thresh_prop, isize,
                       frag_valid, axis_data: str | None = None,
                       axis_locus: str | None = None):
    """Per-shard extract compute + cross-shard combines (runs inside
    shard_map when axis names are given)."""
    unit, unit_len, count = get_repeat_device(bases, lengths, thresh_early, thresh_prop)

    # fragment-length histogram over proper pairs (utils.nim:86-111 analog)
    isz = jnp.clip(isize, 0, 4095)
    frag = jnp.zeros(4096, jnp.int32).at[isz].add(frag_valid.astype(jnp.int32))

    # evidence histogram over canonical unit ids
    uid = unit_code(unit, unit_len)
    units_hist = jnp.zeros(N_UNIT_IDS, jnp.int32).at[uid].add(
        (count > 0).astype(jnp.int32)
    )

    n_str = (count > 0).astype(jnp.int32).sum()

    if axis_locus is not None:
        # per-locus-shard candidate counts gathered to every shard (the
        # merge-side all_gather of candidate bounds)
        n_str = jax.lax.all_gather(n_str, axis_locus)
        frag = jax.lax.psum(frag, axis_locus)
        units_hist = jax.lax.psum(units_hist, axis_locus)
    else:
        n_str = n_str[None]
    if axis_data is not None:
        frag = jax.lax.psum(frag, axis_data)
        units_hist = jax.lax.psum(units_hist, axis_data)
        n_str = jax.lax.psum(n_str, axis_data)
    return unit, unit_len, count, frag, units_hist, n_str


def make_sharded_extract_step(mesh: Mesh):
    """Build the jitted multi-chip extract step over `mesh`.

    Reads are sharded along every mesh axis (fully data-parallel scan);
    histograms come back replicated via psum/all_gather.
    """
    axes = mesh.axis_names
    data_axis = axes[0]
    locus_axis = axes[1] if len(axes) > 1 else None
    shard_axes = tuple(a for a in axes)

    in_specs = (
        P(shard_axes, None),  # bases
        P(shard_axes),        # lengths
        P(shard_axes, None),  # thresh_early
        P(shard_axes, None),  # thresh_prop
        P(shard_axes),        # isize
        P(shard_axes),        # frag_valid
    )
    out_specs = (
        P(shard_axes, None),  # unit
        P(shard_axes),        # unit_len
        P(shard_axes),        # count
        P(),                  # frag hist (replicated)
        P(),                  # unit hist (replicated)
        P(),                  # n_str per locus shard (replicated)
    )

    fn = partial(extract_step_local, axis_data=data_axis, axis_locus=locus_axis)
    smapped = jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                            check_vma=False)
    return jax.jit(smapped)
