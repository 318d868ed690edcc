"""End-to-end CLI coverage: every subcommand driven through cli.main the
way a user invokes it (reference dispatcher strling.nim:12-44), on one tiny
simulated sample."""

import os

import numpy as np
import pytest

from strling_tpu.cli import main

LOCUS = 20000


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    from strling_tpu.io.fasta import build_fai, write_fasta

    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(2)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 40000)])
    seq = seq[:LOCUS] + "CAG" * 60 + seq[LOCUS:]
    fa = str(d / "ref.fa")
    write_fasta(fa, {"chr1": seq})
    build_fai(fa, fa + ".fai")
    return d, fa


def test_cli_simulate_extract_call_flow(workdir):
    d, fa = workdir
    bam = str(d / "s.bam")
    # simulate (reference simulate_reads.nim allele syntax)
    main(["simulate", "--fasta", fa, "--flank", "9000", "--depth", "30",
          "--output", bam, "normal:400,50", f"chr1:{LOCUS}:CAG_0/100"])
    assert os.path.exists(bam)
    # index -> .str bed with the planted reference repeat
    strbed = str(d / "ref.str")
    main(["index", "-g", strbed, fa])
    bedtxt = open(strbed).read()
    assert "AGC" in bedtxt or "CAG" in bedtxt
    # extract (uses the genome index fast path)
    binp = str(d / "s.bin")
    main(["extract", "-f", fa, "-g", strbed, bam, binp])
    assert os.path.getsize(binp) > 0
    # call
    main(["call", "-o", str(d / "out"), bam, binp])
    gt = open(str(d / "out-genotype.txt")).read().splitlines()
    assert len(gt) >= 2 and gt[1].startswith("chr1")
    # call --distributed (single process; mesh collective over CPU devices)
    main(["call", "--distributed", "-o", str(d / "outd"), bam, binp])
    assert open(str(d / "outd-genotype.txt")).read() == \
        open(str(d / "out-genotype.txt")).read()
    # merge (joint discovery from one sample's bin)
    main(["merge", "-o", str(d / "joint"), binp])
    assert os.path.exists(str(d / "joint-bounds.txt"))
    # outliers on the call outputs (single sample: no p-values, but files)
    os.rename(str(d / "out-genotype.txt"), str(d / "s1-genotype.txt"))
    os.rename(str(d / "out-unplaced.txt"), str(d / "s1-unplaced.txt"))
    main(["outliers", "--genotypes", str(d / "s1-genotype.txt"),
          "--unplaced", str(d / "s1-unplaced.txt"),
          "--out", str(d) + "/"])
    assert os.path.exists(str(d / "STRs.tsv"))
    # pull_region debug tool
    out_bam = str(d / "region.bam")
    main(["pull_region", "-o", out_bam, bam,
          f"chr1:{LOCUS - 500}-{LOCUS + 500}"])
    assert os.path.getsize(out_bam) > 0


def test_cli_unknown_command():
    with pytest.raises(SystemExit):
        main(["frobnicate"])
