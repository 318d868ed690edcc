"""Repeat-detector tests: oracle fixtures from reference tests plus
oracle-vs-device cross validation on random reads."""

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
