"""Golden-file regression test: a fully deterministic simulate -> extract ->
call run whose outputs are frozen under tests/golden/.

This pins the end-to-end behavioral contract across refactors (the reference
binary itself cannot run in this environment, so the golden files are
snapshots of this implementation — reviewed against the reference semantics
module-by-module; see docs/parity.md).

Regenerate (after an *intentional* behavior change) with:
    python tests/test_golden.py --regen
"""

import os
import sys

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
LOCUS = 20000


def _run(tmp):
    from strling_tpu.core.call import run_call
    from strling_tpu.core.extract import extract
    from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam
    from strling_tpu.io.bam import Bam
    from strling_tpu.io.binfmt import write_bin
    from strling_tpu.io.fasta import write_fasta

    rng = np.random.default_rng(1234)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 40000)])
    seq = seq[:LOCUS] + "CAG" * 10 + seq[LOCUS:]
    write_fasta(os.path.join(tmp, "ref.fa"), {"chr1": seq})
    simulate_str_bam(
        os.path.join(tmp, "ref.fa"),
        [Allele("chr1", LOCUS, (0, 100), "CAG")],
        os.path.join(tmp, "g.bam"),
        normal_hist(400, 50), depth=30, flank=8000, seed=99,
    )
    bam = Bam(os.path.join(tmp, "g.bam"))
    treads, frag_dist, _ = extract(bam, None, None)
    write_bin(os.path.join(tmp, "g.bin"), treads, frag_dist, bam.header_text, 0.8, 40)
    prefix = os.path.join(tmp, "g")
    run_call(os.path.join(tmp, "g.bam"), os.path.join(tmp, "g.bin"),
             output_prefix=prefix)
    return {
        "genotype.txt": open(prefix + "-genotype.txt").read(),
        "bounds.txt": open(prefix + "-bounds.txt").read(),
        "unplaced.txt": open(prefix + "-unplaced.txt").read(),
    }


def _run_joint(tmp):
    """Joint flow golden: 3 simulated samples -> extract -> merge ->
    call --bounds per sample (merge.nim:47-191, call.nim:158-183), plus the
    --loci flow against a provided bed."""
    from strling_tpu.core.call import run_call
    from strling_tpu.core.extract import extract
    from strling_tpu.core.merge import run_merge
    from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam
    from strling_tpu.io.bam import Bam
    from strling_tpu.io.binfmt import write_bin
    from strling_tpu.io.fasta import write_fasta

    rng = np.random.default_rng(77)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 60000)])
    seq = seq[:LOCUS] + "CAG" * 10 + seq[LOCUS:30000] + "AT" * 12 + seq[30000:]
    ref = os.path.join(tmp, "ref.fa")
    write_fasta(ref, {"chr1": seq})
    alleles_by_sample = [
        [Allele("chr1", LOCUS, (0, 80), "CAG")],
        [Allele("chr1", LOCUS, (10, 40), "CAG"),
         Allele("chr1", 30030, (0, 60), "AT")],
        [Allele("chr1", 30030, (30, 30), "AT")],
    ]
    bins = []
    bams = []
    for s, alleles in enumerate(alleles_by_sample):
        bam_path = os.path.join(tmp, f"s{s}.bam")
        simulate_str_bam(ref, alleles, bam_path, normal_hist(400, 50),
                         depth=24, flank=8000, seed=100 + s)
        bam = Bam(bam_path)
        treads, frag_dist, _ = extract(bam, None, None)
        binp = os.path.join(tmp, f"s{s}.bin")
        write_bin(binp, treads, frag_dist, bam.header_text, 0.8, 40)
        bins.append(binp)
        bams.append(bam_path)

    joint = os.path.join(tmp, "joint")
    run_merge(bins, fasta=ref, output_prefix=joint)
    out = {"joint-bounds.txt": open(joint + "-bounds.txt").read()}
    for s in range(3):
        prefix = os.path.join(tmp, f"s{s}-joint")
        run_call(bams[s], bins[s], bounds_path=joint + "-bounds.txt",
                 output_prefix=prefix)
        out[f"s{s}-joint-genotype.txt"] = open(prefix + "-genotype.txt").read()
        out[f"s{s}-joint-bounds.txt"] = open(prefix + "-bounds.txt").read()

    # --loci flow: a provided bed over the two simulated loci
    loci_bed = os.path.join(tmp, "loci.bed")
    with open(loci_bed, "w") as fh:
        fh.write(f"chr1\t{LOCUS}\t{LOCUS + 30}\tCAG\tHTTish\n")
        fh.write("chr1\t30030\t30054\tAT\tATlocus\n")
    prefix = os.path.join(tmp, "s1-loci")
    run_call(bams[1], bins[1], loci=loci_bed, output_prefix=prefix)
    out["s1-loci-genotype.txt"] = open(prefix + "-genotype.txt").read()
    out["s1-loci-bounds.txt"] = open(prefix + "-bounds.txt").read()
    return out


def _check(outputs):
    for name, content in outputs.items():
        path = os.path.join(GOLDEN, name)
        assert os.path.exists(path), f"golden file missing: {path} (run --regen)"
        expected = open(path).read()
        assert content == expected, (
            f"{name} diverged from golden snapshot:\n--- got ---\n{content}"
            f"\n--- expected ---\n{expected}"
        )


def test_golden(tmp_path):
    _check(_run(str(tmp_path)))


def test_golden_joint_and_loci(tmp_path):
    _check(_run_joint(str(tmp_path)))


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import tempfile

        os.makedirs(GOLDEN, exist_ok=True)
        outputs = _run(tempfile.mkdtemp())
        outputs.update(_run_joint(tempfile.mkdtemp()))
        for name, content in outputs.items():
            with open(os.path.join(GOLDEN, name), "w") as fh:
                fh.write(content)
            print(f"wrote {name} ({len(content)} bytes)")
