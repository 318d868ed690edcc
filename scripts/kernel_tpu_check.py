"""Validate + time the Pallas repeat-scan kernel on the real TPU chip.

Usage: python scripts/kernel_tpu_check.py [B] [iters]

The axon platform pin allows one backend per process, so the script first
re-executes itself under JAX_PLATFORMS=cpu to produce the XLA-path expected
outputs (written to /tmp), then runs the Pallas kernel on the TPU and
byte-compares. Used when iterating on the kernel; the driver bench measures
the same scan through bench.py.
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXP = "/tmp/kernel_tpu_check_expected.npz"


def make_batch(B, L=152):
    rng = np.random.default_rng(0)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    bases = alphabet[rng.integers(0, 4, (B, L))]
    units = [b"CAG", b"A", b"AT", b"AAGGG", b"ATTCT"]
    for i in range(0, B, 10):
        u = units[i % len(units)]
        bases[i] = np.frombuffer((u * (L // len(u) + 1))[:L], np.uint8)
    lengths = np.full(B, L, np.int32)
    lengths[::17] = 100  # short-read tail windows
    bases[1::50, 40:70] = ord("N")  # N-skip gate
    return bases, lengths


def cpu_main(B):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from strling_tpu.ops.kmer import _host_thresholds, get_repeat_device

    bases, lengths = make_batch(B)
    te, tp = _host_thresholds(lengths, np.full(B, 0.8))
    unit, ulen, cnt = jax.jit(get_repeat_device)(bases, lengths, te, tp)
    np.savez(EXP, unit=np.asarray(unit), ulen=np.asarray(ulen),
             cnt=np.asarray(cnt))
    print("wrote", EXP, file=sys.stderr)


def main():
    argv = [a for a in sys.argv[1:] if a != "--cpu"]
    B = int(argv[0]) if len(argv) > 0 else 32768
    iters = int(argv[1]) if len(argv) > 1 else 10
    if "--cpu" in sys.argv:
        cpu_main(B)
        return
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, __file__, str(B), "--cpu"], check=True, env=env)
    exp = np.load(EXP)

    import jax

    from strling_tpu.ops.kmer import _host_thresholds
    from strling_tpu.ops import kmer_pallas as kp

    bases, lengths = make_batch(B)
    te, tp = _host_thresholds(lengths, np.full(B, 0.8))
    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    args = [jax.device_put(x, dev) for x in (bases, lengths, te, tp)]

    t0 = time.perf_counter()
    code, klen, cnt = kp._pallas_jit(*args)
    code = np.asarray(code)
    klen = np.asarray(klen)
    cnt = np.asarray(cnt)
    print(f"first call (compile) {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    ref_units = np.array(["".join(chr(c) for c in row if c)
                          for row in exp["unit"]])
    got_units = np.array(kp.unpack_unit_codes(code, klen))
    bad = np.nonzero((got_units != ref_units) | (cnt != exp["cnt"])
                     | (klen != exp["ulen"]))[0]
    print(f"mismatches: {len(bad)} / {B}")
    if len(bad):
        for i in bad[:10]:
            print(i, got_units[i], int(klen[i]), int(cnt[i]), "want",
                  ref_units[i], int(exp["ulen"][i]), int(exp["cnt"][i]))
        sys.exit(1)

    # timing: slope between short and long dispatch chains (the fixed
    # tunnel latency cancels; bench.py uses the same method). Sync via host
    # fetch — block_until_ready doesn't wait on axon.
    def run(n):
        t0 = time.perf_counter()
        outs = [kp._pallas_jit(*args) for _ in range(n)]
        np.asarray(outs[-1][0])
        return time.perf_counter() - t0

    run(2)
    n1, n2 = 5, 5 + iters
    t1 = min(run(n1) for _ in range(3))
    t2 = min(run(n2) for _ in range(3))
    per_batch = (t2 - t1) / (n2 - n1)
    print(f"B={B}  per_batch={per_batch*1e3:.2f}ms  "
          f"{B/per_batch/1e6:.1f}M reads/s")


if __name__ == "__main__":
    main()
