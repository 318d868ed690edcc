"""End-to-end pipeline tests: simulate -> extract -> call (-> merge, outliers)."""

import os

import numpy as np
import pytest

from strling_tpu.core.call import run_call
from strling_tpu.core.merge import run_merge
from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam
from strling_tpu.io.bam import Bam
from strling_tpu.io.binfmt import read_bin, write_bin
from strling_tpu.io.fasta import write_fasta
from strling_tpu.core.extract import extract

FLANK = 8000
LOCUS = 20000  # position of the (CAG)x10 reference repeat


@pytest.fixture(scope="module")
def sim_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(11)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 40000)])
    seq = seq[:LOCUS] + "CAG" * 10 + seq[LOCUS:]
    write_fasta(str(d / "ref.fa"), {"chr1": seq})
    hist = normal_hist(400, 50)
    for sample, counts, seed in [("s1", (0, 100), 1), ("s2", (0, 0), 2), ("s3", (0, 0), 3)]:
        simulate_str_bam(
            str(d / "ref.fa"),
            [Allele("chr1", LOCUS, counts, "CAG")],
            str(d / f"{sample}.bam"), hist, depth=30, flank=FLANK, seed=seed,
        )
    return d


def _extract_to_bin(d, sample):
    bam = Bam(str(d / f"{sample}.bam"))
    treads, frag_dist, opts = extract(bam, None, None)
    binp = str(d / f"{sample}.bin")
    write_bin(binp, treads, frag_dist, bam.header_text, 0.8, 40)
    return binp


def test_simulated_bam_sane(sim_dir):
    bam = Bam(str(sim_dir / "s1.bam"))
    n = sum(len(b) for b in bam.batches())
    assert n > 2000
    # reads exist around the locus
    m = sum(len(b) for b in bam.query(0, LOCUS - 500, LOCUS + 500))
    assert m > 20


def test_extract_call_expanded(sim_dir):
    binp = _extract_to_bin(sim_dir, "s1")
    ex = read_bin(binp)
    # the expansion should produce plenty of CAG-evidence reads
    units = {t.repeat for t in ex.reads.to_treads()}
    assert "AGC" in units or "CTG" in units, units

    prefix = str(sim_dir / "s1")
    run_call(str(sim_dir / "s1.bam"), binp, output_prefix=prefix)

    bounds_lines = open(prefix + "-bounds.txt").read().splitlines()
    assert bounds_lines[0].startswith("#chrom")
    data = [l.split("\t") for l in bounds_lines[1:]]
    assert data, "no bounds called"
    # a locus near LOCUS with a CAG-rotation repeat unit
    hits = [
        r for r in data
        if abs(int(r[1]) - LOCUS) < 1000 and r[3] in ("AGC", "CTG")
    ]
    assert hits, data

    gt_lines = open(prefix + "-genotype.txt").read().splitlines()
    assert gt_lines[0].startswith("#chrom")
    rows = [l.split("\t") for l in gt_lines[1:]]
    ghits = [r for r in rows if abs(int(r[1]) - LOCUS) < 1000]
    assert ghits
    r = ghits[0]
    # allele2 (long allele, repeat units) should be substantial
    allele2 = float(r[5])
    assert allele2 == allele2 and allele2 > 20, r
    # depth around 30ish
    depth = float(r[14])
    assert 10 < depth < 60, r


def test_call_control_sample_no_locus(sim_dir):
    binp = _extract_to_bin(sim_dir, "s2")
    prefix = str(sim_dir / "s2")
    run_call(str(sim_dir / "s2.bam"), binp, output_prefix=prefix)
    data = [
        l.split("\t")
        for l in open(prefix + "-bounds.txt").read().splitlines()[1:]
    ]
    hits = [r for r in data if abs(int(r[1]) - LOCUS) < 1000]
    assert not hits, hits


def test_merge_and_joint_call(sim_dir):
    bins = [_extract_to_bin(sim_dir, s) for s in ("s1", "s2", "s3")]
    prefix = str(sim_dir / "joint")
    run_merge(bins, fasta=str(sim_dir / "ref.fa"), output_prefix=prefix)
    lines = open(prefix + "-bounds.txt").read().splitlines()
    data = [l.split("\t") for l in lines[1:]]
    hits = [r for r in data if abs(int(r[1]) - LOCUS) < 1000 and r[3] in ("AGC", "CTG")]
    assert hits, data

    # joint call for each sample against the merged bounds
    for s in ("s1", "s2"):
        run_call(
            str(sim_dir / f"{s}.bam"), str(sim_dir / f"{s}.bin"),
            bounds_path=prefix + "-bounds.txt",
            output_prefix=str(sim_dir / f"{s}-joint"),
        )
        glines = open(str(sim_dir / f"{s}-joint") + "-genotype.txt").read().splitlines()
        rows = [l.split("\t") for l in glines[1:]]
        hits = [r for r in rows if abs(int(r[1]) - LOCUS) < 1200]
        assert hits, (s, rows)
    # expanded sample has far higher sum_str_counts than control
    def sum_str(s):
        rows = [
            l.split("\t")
            for l in open(str(sim_dir / f"{s}-joint") + "-genotype.txt").read().splitlines()[1:]
        ]
        return max(int(r[15]) for r in rows) if rows else 0

    assert sum_str("s1") > 5 * max(1, sum_str("s2"))


def test_outliers(sim_dir):
    from strling_tpu.core.outliers import run_outliers

    # require the joint outputs from the previous test; regenerate s3
    for s in ("s1", "s2", "s3"):
        gpath = str(sim_dir / f"{s}-joint-genotype.txt")
        if not os.path.exists(gpath):
            run_call(
                str(sim_dir / f"{s}.bam"), str(sim_dir / f"{s}.bin"),
                bounds_path=str(sim_dir / "joint-bounds.txt"),
                output_prefix=str(sim_dir / f"{s}-joint"),
            )
        # outliers requires -unplaced.txt; sample name is derived from
        # basename.rsplit('-', 1)[0] so name files <sample>-genotype.txt
    out = str(sim_dir / "cohort.")
    run_outliers(
        [str(sim_dir / f"{s}-joint-genotype.txt") for s in ("s1", "s2", "s3")],
        [str(sim_dir / f"{s}-joint-unplaced.txt") for s in ("s1", "s2", "s3")],
        out_prefix=out,
    )
    tsv = open(out + "STRs.tsv").read().splitlines()
    assert tsv[0].split("\t")[0] == "chrom"
    rows = [l.split("\t") for l in tsv[1:]]
    assert rows
    # top outlier row should be the expanded sample at the locus
    header = tsv[0].split("\t")
    si = header.index("sample")
    li = header.index("left")
    top = rows[0]
    assert top[si] == "s1-joint"
    assert abs(int(top[li]) - LOCUS) < 1200
