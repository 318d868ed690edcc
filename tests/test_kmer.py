"""Repeat-detector tests: oracle fixtures from reference tests plus
oracle-vs-device cross validation on random reads."""

import jax.numpy as jnp
import numpy as np
import pytest

from strling_tpu.ops import oracle
from strling_tpu.ops.kmer import get_repeat_batch, units_to_strings

# SAM fixture sequences from reference tests/test_strling.nim
MONOMER = "A" * 150  # test_strling.nim:46-66 (cigar 20S127M3S)
TRIPLET = "TGC" * 50 + "T"  # test_strling.nim:68-89 (cigar 60S91M, 151bp)


def test_oracle_monomer():
    unit, count = oracle.get_repeat(MONOMER, 0.6)
    assert unit == "A"
    assert count == 150


def test_oracle_triplet():
    unit, count = oracle.get_repeat(TRIPLET, 0.8)
    assert unit == "CTG"
    assert count == 49


def test_oracle_nonrepeat():
    rng = np.random.default_rng(0)
    read = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 150)])
    unit, count = oracle.get_repeat(read, 0.8)
    assert unit == ""
    assert count == 0


def test_oracle_n_heavy():
    unit, count = oracle.get_repeat("N" * 30 + "AT" * 60, 0.8)
    assert unit == ""
    assert count == 0


def test_oracle_short_read():
    assert oracle.get_repeat("A", 0.8) == ("", 0)
    assert oracle.get_repeat("", 0.8) == ("", 0)


def _batch(reads, props, L=160):
    B = len(reads)
    bases = np.zeros((B, L), np.uint8)
    lengths = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        b = r.encode()
        bases[i, : len(b)] = np.frombuffer(b, np.uint8)
        lengths[i] = len(b)
    return bases, lengths, np.asarray(props, np.float64)


def test_batch_matches_fixtures():
    reads = [MONOMER, TRIPLET, "ACGTAC" * 25, "N" * 30 + "AT" * 60]
    props = [0.6, 0.8, 0.8, 0.8]
    unit, ulen, count = get_repeat_batch(*_batch(reads, props))
    units = units_to_strings(unit, ulen)
    for i, (r, p) in enumerate(zip(reads, props)):
        exp_unit, exp_count = oracle.get_repeat(r, p)
        assert units[i] == exp_unit, (i, units[i], exp_unit)
        assert count[i] == exp_count, (i, count[i], exp_count)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_batch_matches_oracle_random(seed):
    rng = np.random.default_rng(seed)
    reads = []
    props = []
    alphabet = np.array(list("ACGTN"))
    units = ["AT", "CAG", "AAGGG", "GGGGCC", "A", "ATTCT", "TG"]
    for _ in range(64):
        mode = rng.integers(0, 4)
        L = int(rng.integers(1, 153))
        if mode == 0:  # random
            read = "".join(alphabet[rng.integers(0, 4, L)])
        elif mode == 1:  # pure repeat with random phase
            u = units[rng.integers(0, len(units))]
            ph = int(rng.integers(0, len(u)))
            read = ((u * (L // len(u) + 2))[ph : ph + L])
        elif mode == 2:  # repeat with noise
            u = units[rng.integers(0, len(units))]
            r = list((u * (L // len(u) + 2))[:L])
            for _ in range(max(1, L // 12)):
                r[rng.integers(0, L)] = alphabet[rng.integers(0, 5)]
            read = "".join(r)
        else:  # half repeat, half random
            u = units[rng.integers(0, len(units))]
            h = L // 2
            read = (u * (h // len(u) + 2))[:h] + "".join(
                alphabet[rng.integers(0, 4, L - h)]
            )
        reads.append(read)
        props.append(float(rng.choice([0.8, 0.73, 0.6, 0.4])))

    unit, ulen, count = get_repeat_batch(*_batch(reads, props))
    got = units_to_strings(unit, ulen)
    for i, (r, p) in enumerate(zip(reads, props)):
        exp_unit, exp_count = oracle.get_repeat(r, p)
        assert got[i] == exp_unit, (i, r, p, got[i], exp_unit)
        assert count[i] == exp_count, (i, r, p, int(count[i]), exp_count)


# ------------------------------------------------------ 2-bit packed transfer


def test_pack_unpack_roundtrip():
    from strling_tpu.ops.kmer import pack_bases, unpack_ascii

    rng = np.random.default_rng(11)
    bases = rng.choice(np.frombuffer(b"ACGTN", np.uint8), (64, 96))
    bases[5, 40:] = 0  # padded tail
    pk = pack_bases(bases)
    assert pk is not None
    rec = np.asarray(unpack_ascii(jnp.asarray(pk[0]), jnp.asarray(pk[1])))
    # reconstruction is exact except padding zeros (decoded as 'A'; every
    # kernel consumer is gated by `lengths` past which bytes are unused)
    keep = bases != 0
    assert (rec[keep] == bases[keep]).all()
    assert (rec[~keep] == ord("A")).all()


def test_pack_rejects_iupac():
    from strling_tpu.ops.kmer import pack_bases

    bases = np.full((4, 32), ord("A"), np.uint8)
    bases[2, 7] = ord("R")
    assert pack_bases(bases) is None
    assert pack_bases(np.full((4, 30), ord("A"), np.uint8)) is None  # L%8


def test_scan_codes_packed_equals_ascii():
    from strling_tpu.ops.kmer import scan_codes

    rng = np.random.default_rng(3)
    reads = []
    for i in range(300):
        u = ["CAG", "A", "AT", "AAGGG", "ATTCT", "ACGT"][i % 6]
        n = rng.integers(30, 152)
        if i % 3 == 0:
            s = (u * 60)[:n]
        else:
            s = "".join(rng.choice(list("ACGTN" if i % 7 else "N"))
                        for _ in range(n))
        reads.append(s)
    L = 152
    bases = np.zeros((len(reads), L), np.uint8)
    lengths = np.array([len(r) for r in reads], np.int32)
    for i, r in enumerate(reads):
        bases[i, :len(r)] = np.frombuffer(r.encode(), np.uint8)
    props = np.full(len(reads), 0.8)
    got = scan_codes(bases, lengths, props, bucket=512, pack=True)
    want = scan_codes(bases, lengths, props, bucket=512, pack=False)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_fused_n8_layout_equals_w8():
    """The N-free wire layout (no N-plane) must scan identically to the
    with-N layout on the same N-free batch."""
    import strling_tpu.ops.kmer as K

    rng = np.random.default_rng(9)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    bases = alphabet[rng.integers(0, 4, (64, 96))]
    bases[3] = np.frombuffer(b"CAG" * 32, np.uint8)
    lengths = np.full(64, 96, np.int32)
    props = np.full(64, 0.8)
    pl, layout = K.fuse_payload(bases, lengths, props, return_layout=True)
    assert layout == "n8"
    r1 = np.asarray(K._fused_xla_jit(jnp.asarray(pl), "n8"))
    # force the with-N layout by adding (then masking out) an N row copy
    b2 = bases.copy()
    b2[0, 0] = ord("N")
    pl2, layout2 = K.fuse_payload(b2, lengths, props, return_layout=True)
    assert layout2 == "w8"
    r2 = np.asarray(K._fused_xla_jit(jnp.asarray(pl2), "w8"))
    np.testing.assert_array_equal(r1[1:], r2[1:])  # row 0 differs (the N)


def test_pallas_chunked_tiles_matches(monkeypatch):
    """Batches larger than MAX_TILES*TILE_B run as chained pallas calls in
    one jit; results must equal the single-call path (exercised with a tiny
    MAX_TILES so interpret mode stays fast)."""
    import strling_tpu.ops.kmer_pallas as kp

    rng = np.random.default_rng(10)
    alphabet = np.frombuffer(b"ACGT", np.uint8)
    B, L = 3 * kp.TILE_B, 64
    bases = alphabet[rng.integers(0, 4, (B, L))]
    for i in range(0, B, 7):
        bases[i] = np.frombuffer(b"AT" * (L // 2), np.uint8)
    lengths = np.full(B, L, np.int32)
    from strling_tpu.ops.kmer import _host_thresholds

    te, tp = _host_thresholds(lengths, np.full(B, 0.8))
    whole = kp.get_repeat_device_pallas(bases, lengths, te, tp,
                                        interpret=True)
    monkeypatch.setattr(kp, "MAX_TILES", 1)
    split = kp.get_repeat_device_pallas(bases, lengths, te, tp,
                                        interpret=True)
    for a, b in zip(whole, split):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
