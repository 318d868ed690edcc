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


def test_golden(tmp_path):
    outputs = _run(str(tmp_path))
    for name, content in outputs.items():
        path = os.path.join(GOLDEN, name)
        assert os.path.exists(path), f"golden file missing: {path} (run --regen)"
        expected = open(path).read()
        assert content == expected, (
            f"{name} diverged from golden snapshot:\n--- got ---\n{content}"
            f"\n--- expected ---\n{expected}"
        )


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import tempfile

        os.makedirs(GOLDEN, exist_ok=True)
        outputs = _run(tempfile.mkdtemp())
        for name, content in outputs.items():
            with open(os.path.join(GOLDEN, name), "w") as fh:
                fh.write(content)
            print(f"wrote {name} ({len(content)} bytes)")
