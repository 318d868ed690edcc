"""Overload / failure-containment guards (SURVEY §5 "failure detection").

The reference contains three in-binary overload guards that act as failure
containment on pathological loci; these tests pin each one:
  - >20k cached pairs in a locus window aborts the locus with depth=-1
    (collect.nim:167-170), and call skips genotyping it (call.nim:191-199)
  - fragments with |isize| > 5000 never enter the pair table
    (collect.nim:158)
  - bounds wider than 1000bp are skipped with a stderr notice
    (callclusters.nim:53-58 / call.nim path)
"""

import numpy as np
import pytest

from strling_tpu.core.cluster import Bounds
from strling_tpu.core.collect import spanners, spanners_reference
from strling_tpu.core.simulate import normal_hist
from strling_tpu.io.bam import Bam
from strling_tpu.io.bamwrite import BamRecord, write_bam

HEADER = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:10000000\n"
TARGETS = [("chr1", 10_000_000)]


def _write(path, recs):
    recs.sort(key=lambda r: r.pos)
    write_bam(str(path), HEADER, TARGETS, recs)


def _pairs(n, base, isize=300, prefix="p"):
    rng = np.random.default_rng(1)
    alphabet = np.array(list("ACGT"))
    out = []
    for i in range(n):
        pos = base + (i % 997)
        mpos = pos + isize - 100
        q = f"{prefix}{i}"
        s = "".join(alphabet[rng.integers(0, 4, 100)])
        out.append(BamRecord(q, 99, 0, pos, 60, "100M", 0, mpos, isize, s))
        out.append(BamRecord(q, 147, 0, mpos, 60, "100M", 0, pos, -isize, s))
    return out


def test_high_depth_locus_aborts(tmp_path):
    # >20k distinct pairs inside the query window -> ([], -1, 0)
    p = tmp_path / "deep.bam"
    _write(p, _pairs(22_000, base=50_000))
    bounds = Bounds(tid=0, left=50_400, right=50_460, repeat="AGC")
    frag = normal_hist(300, 30)
    for fn in (spanners, spanners_reference):
        sup, depth, exp = fn(Bam(str(p)), bounds, 500, frag)
        assert depth == -1 and sup == [] and float(exp) == 0.0, fn.__name__


def test_below_threshold_locus_genotypes(tmp_path):
    p = tmp_path / "ok.bam"
    _write(p, _pairs(2_000, base=50_000))
    bounds = Bounds(tid=0, left=50_400, right=50_460, repeat="AGC")
    frag = normal_hist(300, 30)
    sup, depth, exp = spanners(Bam(str(p)), bounds, 500, frag)
    assert depth > 0 and len(sup) > 0


def test_huge_isize_fragments_excluded(tmp_path):
    # pairs with |isize| > 5000 must not produce SpanningFragment support
    p = tmp_path / "iso.bam"
    recs = _pairs(50, base=50_000, isize=300, prefix="ok")
    recs += _pairs(50, base=49_000, isize=8_000, prefix="far")
    _write(p, recs)
    bounds = Bounds(tid=0, left=50_400, right=50_460, repeat="AGC")
    frag = normal_hist(300, 30)
    sup, depth, exp = spanners(Bam(str(p)), bounds, 2_000, frag)
    frag_qnames = {
        s.qname for s in sup if type(s).__name__ == "Support" and
        getattr(s, "Type", None) is not None and "Fragment" in str(s.Type)
    }
    assert not any(q.startswith("far") for q in frag_qnames)


def test_wide_bounds_skipped(tmp_path, capsys):
    # call skips bounds wider than 1000bp with a stderr notice
    from strling_tpu.core.call import run_call
    from strling_tpu.core.extract import extract
    from strling_tpu.io.binfmt import write_bin

    p = tmp_path / "w.bam"
    recs = _pairs(500, base=50_000)
    recs.append(BamRecord("str1", 97, 0, 50_100, 60, "100M", 0, 50_350, 350,
                          "CAG" * 33 + "C"))
    recs.append(BamRecord("str1", 145, 0, 50_350, 0, "100M", 0, 50_100, -350,
                          "CAG" * 33 + "C"))
    _write(p, recs)
    bam = Bam(str(p))
    tb, frag, _ = extract(bam, None, None)
    binp = str(tmp_path / "w.bin")
    write_bin(binp, tb, frag, bam.header_text, 0.8, 40)
    wide = tmp_path / "wide-bounds.txt"
    wide.write_text(
        "#chrom\tleft\tright\trepeat\tname\tleft_most\tright_most\t"
        "center_mass\tn_left\tn_right\tn_total\n"
        "chr1\t50000\t52000\tAGC\twide\t49000\t53000\t51000\t5\t5\t10\n"
    )
    run_call(str(p), binp, bounds_path=str(wide),
             output_prefix=str(tmp_path / "out"))
    err = capsys.readouterr().err
    assert "large bounds" in err and "skipping" in err
    lines = open(str(tmp_path / "out-genotype.txt")).read().splitlines()
    assert not any("\t50000\t52000\t" in l for l in lines)
