"""Canonicalization tests, ported from reference tests/test_utils.nim."""

from strling_tpu.ops.encode import (
    canonical_repeat,
    decode_kmer,
    encode_kmer,
    min_rev_complement,
    min_rotation,
    reduce_repeat,
    reverse_complement,
)


def test_encode_roundtrip():
    for s in ["A", "CTG", "AAGGG", "ATTCT", "GGGGCC", "ACTGAC"]:
        assert decode_kmer(encode_kmer(s), len(s)) == s


def test_encode_trick_values():
    # (ascii >> 1) & 3: A=0, C=1, T=2, G=3
    assert encode_kmer("A") == 0
    assert encode_kmer("C") == 1
    assert encode_kmer("T") == 2
    assert encode_kmer("G") == 3


def test_reverse_complement():
    assert reverse_complement("CCCTT") == "AAGGG"
    assert reverse_complement("CAG") == "CTG"
    # non-ACGT chars map to themselves (utils.nim:46-47)
    assert reverse_complement("AN") == "NT"


def test_reduce_repeat():
    # tests/test_utils.nim:36-64
    assert reduce_repeat("CCC") == ("C", 3)
    assert reduce_repeat("AA") == ("A", 2)
    assert reduce_repeat("AAAAAA") == ("A", 6)
    assert reduce_repeat("CTC") == ("CTC", 1)
    assert reduce_repeat("CTCC") == ("CTCC", 1)
    assert reduce_repeat("CCCCCT") == ("CCCCCT", 1)


def test_canonical_repeat():
    # tests/test_utils.nim:66-74
    assert canonical_repeat("CCCTT") == "AAGGG"
    # forward already canonical
    assert canonical_repeat("AAG") == "AAG"


def test_min_rotation_uses_code_order():
    # ordering is A < C < T < G (2-bit codes), NOT ASCII:
    # rotations of "GT" are {GT, TG}; ASCII-min is GT but code-min is TG.
    assert min_rotation("GT") == "TG"
    assert min_rotation("TGC") == "CTG"
    assert min_rotation("AAGGG") == "AAGGG"


def test_min_rev_complement():
    # revcomp(CAG) = CTG; rotations {CTG, TGC, GCT} -> CTG
    assert min_rev_complement("CAG") == "CTG"
    assert min_rev_complement("CCCTT") == "AAGGG"
