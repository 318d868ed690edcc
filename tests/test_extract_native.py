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
    from strling_tpu.ops.kmer import scan_codes_dispatch

    bam = Bam(str_bam)
    fd = native_frag_hist(bam)
    med = fraglen.median(fd)
    ne = NativeExtractor(bam, 0.8, 40, med, batch_records=64)
    tb_small = ne.run(lambda b, l, p: scan_codes_dispatch(b, l, p, bucket=256))
    tb_py, _, _ = extract(Bam(str_bam), None, None)
    _cmp(tb_small, tb_py)
