"""Cohort-scale joint pipeline: 10 samples -> merge -> joint call -> outliers.

Mirrors BASELINE config 5 (cohort joint call + outlier detection) at test
scale: one expanded carrier among controls must surface as the top outlier.
"""

import numpy as np
import pytest

from strling_tpu.core.call import run_call
from strling_tpu.core.extract import extract
from strling_tpu.core.merge import run_merge
from strling_tpu.core.outliers import run_outliers
from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam
from strling_tpu.io.bam import Bam
from strling_tpu.io.binfmt import write_bin
from strling_tpu.io.fasta import write_fasta

LOCUS = 15000
N_SAMPLES = 10
CARRIER = "s03"


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    d = tmp_path_factory.mktemp("cohort")
    rng = np.random.default_rng(77)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 30000)])
    seq = seq[:LOCUS] + "AAGGG" * 8 + seq[LOCUS:]
    write_fasta(str(d / "ref.fa"), {"chr1": seq})
    hist = normal_hist(380, 45)
    bins = []
    for i in range(N_SAMPLES):
        s = f"s{i:02d}"
        counts = (0, 90) if s == CARRIER else (0, 0)
        simulate_str_bam(
            str(d / "ref.fa"), [Allele("chr1", LOCUS, counts, "AAGGG")],
            str(d / f"{s}.bam"), hist, depth=25, flank=6000, seed=100 + i,
        )
        bam = Bam(str(d / f"{s}.bam"))
        treads, fd, _ = extract(bam, None, None)
        write_bin(str(d / f"{s}.bin"), treads, fd, bam.header_text, 0.8, 40)
        bins.append(str(d / f"{s}.bin"))
    run_merge(bins, fasta=str(d / "ref.fa"), output_prefix=str(d / "joint"))
    for i in range(N_SAMPLES):
        s = f"s{i:02d}"
        run_call(
            str(d / f"{s}.bam"), str(d / f"{s}.bin"),
            bounds_path=str(d / "joint-bounds.txt"),
            output_prefix=str(d / s),
        )
    return d


def test_joint_bounds_has_locus(cohort):
    data = [
        l.split("\t")
        for l in open(str(cohort / "joint-bounds.txt")).read().splitlines()[1:]
    ]
    hits = [r for r in data if abs(int(r[1]) - LOCUS) < 1000]
    assert hits, data


def test_carrier_is_top_outlier(cohort):
    run_outliers(
        [str(cohort / f"s{i:02d}-genotype.txt") for i in range(N_SAMPLES)],
        [str(cohort / f"s{i:02d}-unplaced.txt") for i in range(N_SAMPLES)],
        out_prefix=str(cohort / "cohort."),
    )
    tsv = open(str(cohort / "cohort.STRs.tsv")).read().splitlines()
    header = tsv[0].split("\t")
    si, li, pi = header.index("sample"), header.index("left"), header.index("p_adj")
    rows = [l.split("\t") for l in tsv[1:]]
    top = rows[0]
    assert top[si] == CARRIER
    assert abs(int(top[li]) - LOCUS) < 1000
    # and significant vs the cohort
    p_adj = float(top[pi])
    assert p_adj < 0.05


def test_all_zero_cohort_raises(cohort):
    # controls alone have zero STR signal at every locus -> the z table is
    # empty; surfaced as the reference's intended error
    controls_g = [
        str(cohort / f"s{i:02d}-genotype.txt") for i in range(N_SAMPLES)
        if f"s{i:02d}" != CARRIER
    ]
    controls_u = [
        str(cohort / f"s{i:02d}-unplaced.txt") for i in range(N_SAMPLES)
        if f"s{i:02d}" != CARRIER
    ]
    with pytest.raises(ValueError, match="z score table is empty"):
        run_outliers(controls_g, controls_u, out_prefix=str(cohort / "zz."))


def test_control_emit_and_reuse(cohort):
    # emit robust estimates from the whole batch (the documented control-set
    # workflow), then score the carrier alone against them
    run_outliers(
        [str(cohort / f"s{i:02d}-genotype.txt") for i in range(N_SAMPLES)],
        [str(cohort / f"s{i:02d}-unplaced.txt") for i in range(N_SAMPLES)],
        out_prefix=str(cohort / "ctrl."), emit=str(cohort / "controls.tsv"),
    )
    assert "null_locus_counts" in open(str(cohort / "controls.tsv")).read()

    run_outliers(
        [str(cohort / f"{CARRIER}-genotype.txt")],
        [str(cohort / f"{CARRIER}-unplaced.txt")],
        out_prefix=str(cohort / "case."), control=str(cohort / "controls.tsv"),
    )
    tsv = open(str(cohort / "case.STRs.tsv")).read().splitlines()
    header = tsv[0].split("\t")
    oi, li = header.index("outlier"), header.index("left")
    rows = [l.split("\t") for l in tsv[1:]]
    locus_rows = [r for r in rows if abs(int(float(r[li])) - LOCUS) < 1000]
    assert locus_rows
    assert any(float(r[oi]) > 2 for r in locus_rows)


def test_distributed_merge_matches_cohort(cohort):
    """10-sample joint discovery: locus-space-sharded merge reproduces the
    single-process bounds exactly (order-insensitively)."""
    from strling_tpu.parallel.merge_dist import run_merge_dist

    bins = [str(cohort / f"s{i:02d}.bin") for i in range(N_SAMPLES)]
    lines = run_merge_dist(bins, fasta=str(cohort / "ref.fa"),
                           output_prefix=str(cohort / "joint_dist"))
    with open(str(cohort / "joint-bounds.txt")) as f:
        want = sorted(f.read().splitlines()[1:])
    assert sorted(lines) == want
    assert len(want) >= 1
