"""Native C++ extract engine vs the Python reference extractor."""

import numpy as np
import pytest

from strling_tpu.core.extract import extract, extract_native
from strling_tpu.core.genome_index import GenomeIndex
from strling_tpu.io.bam import Bam
from strling_tpu.io.extract_native import native_frag_hist
from strling_tpu.utils import fraglen

from test_extract import _str_bam


@pytest.fixture(scope="module")
def str_bam(tmp_path_factory):
    p = tmp_path_factory.mktemp("exn") / "str.bam"
    _str_bam(str(p))
    return str(p)


def test_native_frag_hist_matches(str_bam):
    h1 = native_frag_hist(Bam(str_bam))
    h2 = fraglen.fragment_length_distribution(Bam(str_bam))
    np.testing.assert_array_equal(h1, h2)


def _cmp(tb1, tb2):
    assert len(tb1) == len(tb2), (len(tb1), len(tb2))
    t1 = tb1.to_treads()
    t2 = tb2.to_treads()
    for a, b in zip(t1, t2):
        assert a == b, (a, b)


def test_native_matches_python(str_bam):
    tb_py, fd_py, _ = extract(Bam(str_bam), None, None)
    tb_nat, fd_nat, _ = extract_native(Bam(str_bam), None, None)
    np.testing.assert_array_equal(fd_py, fd_nat)
    _cmp(tb_nat, tb_py)


def test_native_matches_python_with_index(str_bam):
    gi = GenomeIndex({"chr1": [(49000, 52000)]})
    tb_py, _, _ = extract(Bam(str_bam), None, None, genome_index=gi)
    tb_nat, _, _ = extract_native(Bam(str_bam), None, None, genome_index=gi)
    _cmp(tb_nat, tb_py)


def test_native_small_batches(str_bam):
    """Batch boundaries must not change pairing results."""
    from strling_tpu.io.extract_native import NativeExtractor

    bam = Bam(str_bam)
    fd = native_frag_hist(bam)
    med = fraglen.median(fd)
    ne = NativeExtractor(bam, 0.8, 40, med, batch_records=64)
    tb_small = ne.run(buckets=(256,))
    tb_py, _, _ = extract(Bam(str_bam), None, None)
    _cmp(tb_small, tb_py)


def test_fused_payload_matches_python_fuse(str_bam):
    """sio_ex_next_fused must emit rows byte-identical to ops.kmer's
    fuse_payload over the same ASCII rows (2-bit codes, N bitmask, and the
    double-precision te/tp thresholds)."""
    from strling_tpu.io.extract_native import NativeExtractor
    from strling_tpu.ops.kmer import fuse_payload

    med = fraglen.median(native_frag_hist(Bam(str_bam)))
    # ascii rows via the legacy path
    ne1 = NativeExtractor(Bam(str_bam), 0.8, 40, med)
    rows1, n1, bases, lengths, props = ne1._next()
    # fused rows via the new path
    ne2 = NativeExtractor(Bam(str_bam), 0.8, 40, med)
    rows2, n2, payload, layout, ascii_rows = ne2._next_fused()
    assert (rows1, n1) == (rows2, n2) and rows1 > 0
    assert ascii_rows is None, "ACGT-only data must not fall back"
    want, want_layout = fuse_payload(bases[:rows1], lengths[:rows1],
                                     props[:rows1], return_layout=True)
    assert layout == want_layout
    np.testing.assert_array_equal(payload[:rows1], want)
    assert not payload[rows1:].any()  # pre-padded tail stays zero


def test_fused_payload_iupac_fallback(tmp_path):
    """A batch containing a non-ACGTN base must fall back to ASCII rows (the
    2-bit code of e.g. 'R' is not recoverable; parity requires the raw
    bytes)."""
    from test_extract import HEADER, TARGETS
    from strling_tpu.io.bamwrite import BamRecord, write_bam
    from strling_tpu.io.extract_native import NativeExtractor

    rng = np.random.default_rng(3)
    alphabet = np.array(list("ACGT"))
    recs = []
    for i in range(50):
        pos = 1000 + i * 37
        s = "".join(alphabet[rng.integers(0, 4, 100)])
        if i == 25:
            s = s[:50] + "R" + s[51:]
        isz = 300
        recs.append(BamRecord(f"p{i}", 99, 0, pos, 60, "100M", 0, pos + 200,
                              isz, s))
        recs.append(BamRecord(f"p{i}", 147, 0, pos + 200, 60, "100M", 0, pos,
                              -isz, "".join(alphabet[rng.integers(0, 4, 100)])))
    recs.sort(key=lambda r: r.pos)
    p = tmp_path / "iupac.bam"
    write_bam(str(p), HEADER, TARGETS, recs)
    ne = NativeExtractor(Bam(str(p)), 0.8, 40, 350)
    rows, n, payload, layout, ascii_rows = ne._next_fused()
    assert rows > 0 and payload is None and ascii_rows is not None
    bases, lengths, props = ascii_rows
    assert any(b"R" in bytes(bases[r, : lengths[r]]) for r in range(rows))
    # and the full engine still produces results equal to the Python path
    tb_nat, _, _ = extract_native(Bam(str(p)), None, None)
    tb_py, _, _ = extract(Bam(str(p)), None, None)
    _cmp(tb_nat, tb_py)


def test_fused_payload_n_plane_layouts(tmp_path):
    """Batches with any N must use the w8 layout (N bitmask plane); N-free
    batches drop the plane (n8). Both must match Python fuse_payload
    byte-for-byte and produce identical treads."""
    from test_extract import HEADER, TARGETS
    from strling_tpu.io.bamwrite import BamRecord, write_bam
    from strling_tpu.io.extract_native import NativeExtractor
    from strling_tpu.ops.kmer import fuse_payload

    rng = np.random.default_rng(4)
    alphabet = np.array(list("ACGT"))
    for with_n, want_layout in ((False, "n8"), (True, "w8")):
        recs = []
        for i in range(40):
            pos = 1000 + i * 53
            s = "".join(alphabet[rng.integers(0, 4, 104)])
            if with_n and i == 11:
                s = s[:30] + "NNN" + s[33:]
            recs.append(BamRecord(f"p{i}", 99, 0, pos, 60, "104M", 0,
                                  pos + 200, 304, s))
            recs.append(BamRecord(f"p{i}", 147, 0, pos + 200, 60, "104M", 0,
                                  pos, -304, "".join(
                                      alphabet[rng.integers(0, 4, 104)])))
        recs.sort(key=lambda r: r.pos)
        p = tmp_path / f"n{int(with_n)}.bam"
        write_bam(str(p), HEADER, TARGETS, recs)
        ne = NativeExtractor(Bam(str(p)), 0.8, 40, 350, Lmax=104)
        rows, n, payload, layout, ascii_rows = ne._next_fused()
        assert rows > 0 and ascii_rows is None
        assert layout == want_layout
        ne2 = NativeExtractor(Bam(str(p)), 0.8, 40, 350, Lmax=104)
        rows2, n2, bases, lengths, props = ne2._next()
        want, wl = fuse_payload(bases[:rows], lengths[:rows], props[:rows],
                                return_layout=True)
        assert wl == want_layout
        np.testing.assert_array_equal(payload[:rows], want)
        # end-to-end equality through the scan
        tb_nat, _, _ = extract_native(Bam(str(p)), None, None)
        tb_py, _, _ = extract(Bam(str(p)), None, None)
        _cmp(tb_nat, tb_py)
