"""Stage-toggle timing for the Pallas repeat-scan kernel (experiment tool).

Compiles the PRODUCTION kernel (ops/kmer_pallas.py) with stages disabled to
attribute device time (the `variant` parameter exists only for this tool):

  full        - the real kernel
  no_greedy   - exact non-overlapping recount skipped (modal estimate used)
  no_modal    - modal NE-counting skipped (first valid window code used)
  winmin_only - neither (window min-rotation codes + selection scan only)

The difference full - no_X attributes X's cost; winmin_only bounds the
irreducible encode+window floor. Timing uses the same two-length pipelined
dispatch-chain slope as bench.py (tunnel RTTs cancel).

Usage: [JAX_PLATFORMS=cpu] python scripts/exp_kernel_timing.py [--smoke]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcomp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from functools import partial  # noqa: E402

from strling_tpu.ops.kmer import _host_thresholds  # noqa: E402
from strling_tpu.ops.kmer_pallas import get_repeat_device_pallas  # noqa: E402

VARIANTS = ("full", "no_greedy", "no_modal", "winmin_only")


def main():
    smoke = "--smoke" in sys.argv
    B, L = (4096, 152) if smoke else (32768, 152)
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
    args = [jax.device_put(x, dev) for x in (bases_np, lengths_np, te, tp)]

    import jax.numpy as jnp

    tok0 = jax.device_put(jnp.zeros((), jnp.int32), dev)
    results = {}
    for variant in VARIANTS:
        base = partial(get_repeat_device_pallas, variant=variant,
                       interpret=jax.default_backend() == "cpu")

        # token serializes chained dispatches (independent programs can be
        # overlapped by the remote service — see bench.bench_kernel)
        @jax.jit
        def fn(b, l, te, tp, token, base=base):
            code, klen, cnt = base(b, l, te, tp)
            return cnt, token + cnt[0]

        np.asarray(fn(*args, tok0)[0])

        def run(iters):
            t0 = time.perf_counter()
            token = tok0
            for _ in range(iters):
                _, token = fn(*args, token)
            np.asarray(token)
            return time.perf_counter() - t0

        run(2)
        n1, n2 = (2, 4) if smoke else (5, 25)
        reps = 1 if smoke else 3
        t1 = min(run(n1) for _ in range(reps))
        t2 = min(run(n2) for _ in range(reps))
        per_batch = max(1e-9, (t2 - t1) / (n2 - n1))
        results[variant] = per_batch
        print(f"{variant:12s} {per_batch*1e3:7.3f} ms/batch "
              f"{B/per_batch/1e6:8.1f} M reads/s", flush=True)

    full = results["full"]
    print("\nattribution (share of full):")
    print(f"  exact recount (greedy): "
          f"{(full - results['no_greedy'])/full*100:5.1f}%")
    print(f"  modal NE-count:         "
          f"{(full - results['no_modal'])/full*100:5.1f}%")
    print(f"  encode+winmin+select:   "
          f"{results['winmin_only']/full*100:5.1f}%")


if __name__ == "__main__":
    main()
