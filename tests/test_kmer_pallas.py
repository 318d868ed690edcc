"""Pallas kernel vs oracle cross-validation (interpret mode on CPU)."""

import numpy as np
import pytest

from strling_tpu.ops import oracle
from strling_tpu.ops.kmer import _host_thresholds
from strling_tpu.ops.kmer_pallas import (
    TILE_B,
    get_repeat_device_pallas,
    unpack_unit_codes,
)


def _batch(reads, props, L=160):
    B = len(reads)
    bases = np.zeros((B, L), np.uint8)
    lengths = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        b = r.encode()
        bases[i, : len(b)] = np.frombuffer(b, np.uint8)
        lengths[i] = len(b)
    return bases, lengths, np.asarray(props, np.float64)


@pytest.mark.parametrize("seed", [1, 4])
def test_pallas_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    alphabet = np.array(list("ACGTN"))
    units = ["AT", "CAG", "AAGGG", "GGGGCC", "A", "ATTCT", "TG"]
    reads, props = [], []
    for _ in range(48):
        mode = rng.integers(0, 4)
        L = int(rng.integers(1, 153))
        if mode == 0:
            read = "".join(alphabet[rng.integers(0, 4, L)])
        elif mode == 1:
            u = units[rng.integers(0, len(units))]
            ph = int(rng.integers(0, len(u)))
            read = (u * (L // len(u) + 2))[ph : ph + L]
        elif mode == 2:
            u = units[rng.integers(0, len(units))]
            r = list((u * (L // len(u) + 2))[:L])
            for _ in range(max(1, L // 12)):
                r[rng.integers(0, L)] = alphabet[rng.integers(0, 5)]
            read = "".join(r)
        else:
            u = units[rng.integers(0, len(units))]
            h = L // 2
            read = (u * (h // len(u) + 2))[:h] + "".join(
                alphabet[rng.integers(0, 4, L - h)]
            )
        reads.append(read)
        props.append(float(rng.choice([0.8, 0.73, 0.6])))

    bases, lengths, props = _batch(reads, props)
    te, tp = _host_thresholds(lengths, props)
    code, klen, cnt = get_repeat_device_pallas(
        bases, lengths, te, tp, interpret=True
    )
    got_units = unpack_unit_codes(np.asarray(code), np.asarray(klen))
    for i, (r, p) in enumerate(zip(reads, props)):
        exp_unit, exp_count = oracle.get_repeat(r, float(p))
        assert got_units[i] == exp_unit, (i, r, got_units[i], exp_unit)
        assert int(cnt[i]) == exp_count, (i, r, int(cnt[i]), exp_count)


def test_pallas_fixtures():
    reads = ["TGC" * 50 + "T", "A" * 150, "N" * 30 + "AT" * 60]
    props = [0.8, 0.6, 0.8]
    bases, lengths, props = _batch(reads, props)
    te, tp = _host_thresholds(lengths, props)
    code, klen, cnt = get_repeat_device_pallas(bases, lengths, te, tp, interpret=True)
    units = unpack_unit_codes(np.asarray(code), np.asarray(klen))
    assert units == ["CTG", "A", ""]
    assert cnt.tolist() == [49, 150, 0]


def test_pallas_modal_tiebreak_adversarial():
    """Reads engineered so two window codes tie on count: winner must be the
    code whose LAST occurrence comes earliest (the reference CountTable
    running-argmax semantics, utils.nim:192-211), exercising the triangular
    is_last tie-break path for k>=3."""
    reads = [
        # k=3 windows alternate CAG/TTG: equal counts, CAG's last
        # occurrence earlier in one phase, later in the other
        "CAGTTG" * 25,
        "TTGCAG" * 25,
        # trailing singleton breaks the tie asymmetrically
        "CAGTTG" * 24 + "CAG",
        "TTGCAG" * 24 + "TTG",
        # three-way tie among k=2 and k=4 candidates
        "ATGC" * 30,
        "ACGTAACC" * 15,
        # tie between k=5 codes
        ("AAGGG" + "CCTTT") * 15,
        # short reads right at window-count boundaries
        "CAGCAG",
        "CAGCAGC",
        "ATATAT",
    ]
    props = [0.3] * len(reads)  # low threshold so ties actually report
    bases, lengths, props = _batch(reads, props)
    te, tp = _host_thresholds(lengths, props)
    code, klen, cnt = get_repeat_device_pallas(
        bases, lengths, te, tp, interpret=True
    )
    units = unpack_unit_codes(np.asarray(code), np.asarray(klen))
    for i, (r, p) in enumerate(zip(reads, [0.3] * len(reads))):
        exp_unit, exp_count = oracle.get_repeat(r, p)
        assert units[i] == exp_unit, (i, r, units[i], exp_unit)
        assert int(cnt[i]) == exp_count, (i, r, int(cnt[i]), exp_count)


def test_pallas_iupac_bytes_match_oracle():
    """IUPAC bytes share 2-bit codes with real bases ('R' encodes like 'C')
    but must never satisfy the exact-recount ASCII compare (utils.nim:254)."""
    reads = [
        "CAG" * 20 + "R" + "CAG" * 20,    # R interrupts the run
        ("CAR" * 30)[:90],                # R inside every unit
        "AT" * 30 + "RYSWKM" + "AT" * 30,
        "R" * 60,                          # all-IUPAC read
    ]
    props = [0.5] * len(reads)
    bases, lengths, props = _batch(reads, props)
    te, tp = _host_thresholds(lengths, props)
    code, klen, cnt = get_repeat_device_pallas(
        bases, lengths, te, tp, interpret=True
    )
    units = unpack_unit_codes(np.asarray(code), np.asarray(klen))
    for i, (r, p) in enumerate(zip(reads, [0.5] * len(reads))):
        exp_unit, exp_count = oracle.get_repeat(r, p)
        assert units[i] == exp_unit, (i, r, units[i], exp_unit)
        assert int(cnt[i]) == exp_count, (i, r, int(cnt[i]), exp_count)


def test_pallas_packed_n8_matches_ascii():
    """The packed n8 kernel path (2-bit rows in, band-matmul position
    permutation) must produce identical results to the ASCII path on
    N-free batches, including short lengths and planted repeats."""
    import numpy as np

    from strling_tpu.ops.kmer import _host_thresholds, pack_bases

    rng = np.random.default_rng(9)
    B, L = 64, 104
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    bases = alphabet[rng.integers(0, 4, (B, L))]
    units = [b"CAG", b"A", b"AT", b"AAGGG", b"ATTCT", b"ACGTCG"]
    for i in range(0, B, 3):
        u = units[i % len(units)]
        bases[i] = np.frombuffer((u * (L // len(u) + 1))[:L], np.uint8)
    lengths = rng.integers(8, L + 1, B).astype(np.int32)
    for i, l in enumerate(lengths):
        bases[i, l:] = 0
    te, tp = _host_thresholds(lengths, np.full(B, 0.8))
    codes = (bases >> 1) & 3
    packed = (codes[:, 0::4] | (codes[:, 1::4] << 2) | (codes[:, 2::4] << 4)
              | (codes[:, 3::4] << 6)).astype(np.uint8)
    a = get_repeat_device_pallas(bases, lengths, te.astype(np.int32),
                                 tp.astype(np.int32), interpret=True)
    p = get_repeat_device_pallas(packed, lengths, te.astype(np.int32),
                                 tp.astype(np.int32), interpret=True,
                                 packed=True)
    for x, y in zip(a, p):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_sorted_modal_alternative_matches_oracle():
    """STRLING_MODAL_IMPL=sorted (the bitonic modal counter) must stay
    green: run a small batch through the kernel in a subprocess with the
    env set and compare against the oracle."""
    import os
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent("""
        import os, sys
        import numpy as np
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, os.environ["STRLING_REPO"])
        from strling_tpu.ops import oracle
        from strling_tpu.ops.kmer import _host_thresholds
        from strling_tpu.ops.kmer_pallas import (
            MODAL_IMPL,
            get_repeat_device_pallas,
            unpack_unit_codes,
        )
        assert MODAL_IMPL == "sorted"
        rng = np.random.default_rng(5)
        alpha = np.frombuffer(b"ACGT", np.uint8)
        B, L = 1024, 96
        bases = alpha[rng.integers(0, 4, (B, L))]
        units = [b"CAG", b"AT", b"AAGGG", b"A", b"CTGGAA"]
        for i in range(0, B, 5):
            u = units[i % len(units)]
            bases[i] = np.frombuffer((u * (L // len(u) + 1))[:L], np.uint8)
        lengths = np.full(B, L, np.int32)
        lengths[::7] = 64
        te, tp = _host_thresholds(lengths, np.full(B, 0.8))
        code, ulen, cnt = get_repeat_device_pallas(
            bases, lengths, te, tp, interpret=True)
        units_out = unpack_unit_codes(np.asarray(code), np.asarray(ulen))
        for i in range(B):
            want_u, want_c = oracle.get_repeat(
                bases[i, : lengths[i]].tobytes().decode(), 0.8)
            assert units_out[i] == want_u, (i, units_out[i], want_u)
            assert int(cnt[i]) == want_c, (i, int(cnt[i]), want_c)
        print("sorted-modal ok")
    """)
    env = dict(os.environ)
    env["STRLING_MODAL_IMPL"] = "sorted"
    env["JAX_PLATFORMS"] = "cpu"
    env["STRLING_REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "sorted-modal ok" in out.stdout
