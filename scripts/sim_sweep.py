#!/usr/bin/env python
"""Random STR-allele simulation sweep with truth-vs-call aggregation.

Equivalent of the reference's sim/random_str_alleles.py +
sim/simulate_random.groovy + sim/combine_random_sim_results.py: simulate a
range of allele sizes at random (novel) loci, run extract -> call on each
simulated sample, and aggregate concordance against the simulated truth into
one CSV.

Usage:
  python scripts/sim_sweep.py --fasta ref.fa --out sweep/ \
      [--n-loci 8] [--max-units 300] [--depth 30] [--seed 7]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from strling_tpu.core.call import run_call  # noqa: E402
from strling_tpu.core.extract import extract  # noqa: E402
from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam  # noqa: E402
from strling_tpu.io.bam import Bam  # noqa: E402
from strling_tpu.io.binfmt import write_bin  # noqa: E402
from strling_tpu.io.fasta import Fasta  # noqa: E402
from strling_tpu.ops.encode import canonical_repeat  # noqa: E402

UNITS = ["A", "AT", "AAG", "CAG", "AGAT", "AAGGG", "AATGG", "GGGGCC"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fasta", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--n-loci", type=int, default=8)
    p.add_argument("--min-units", type=int, default=0)
    p.add_argument("--max-units", type=int, default=300)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--depth", type=int, default=30)
    p.add_argument("--flank", type=int, default=8000)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--slop", type=int, default=500)
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    fai = Fasta(args.fasta)
    rng = np.random.default_rng(args.seed)
    hist = normal_hist(400, 60)

    configs = []
    for i in range(args.n_loci):
        chrom = fai.names[int(rng.integers(0, len(fai.names)))]
        L = fai.chrom_len(chrom)
        pos = int(rng.integers(args.flank + 1000, max(args.flank + 2000, L - args.flank - 5000)))
        unit = UNITS[int(rng.integers(0, len(UNITS)))]
        for count in np.linspace(args.min_units, args.max_units, args.steps).astype(int):
            configs.append((i, chrom, pos, unit, int(count)))

    rows = []
    for i, chrom, pos, unit, count in configs:
        tag = f"l{i}_{unit}_{count}"
        bam_path = os.path.join(args.out, tag + ".bam")
        simulate_str_bam(
            args.fasta, [Allele(chrom, pos, (0, count), unit)], bam_path,
            hist, depth=args.depth, flank=args.flank,
            seed=int(rng.integers(0, 1 << 31)),
        )
        bam = Bam(bam_path)
        treads, frag_dist, _ = extract(bam, None, None)
        bin_path = os.path.join(args.out, tag + ".bin")
        write_bin(bin_path, treads, frag_dist, bam.header_text, 0.8, 40)
        prefix = os.path.join(args.out, tag)
        run_call(bam_path, bin_path, output_prefix=prefix)

        canon = canonical_repeat(unit)
        called = False
        est = float("nan")
        sum_str = 0
        with open(prefix + "-genotype.txt") as fh:
            header = fh.readline().rstrip("\n").split("\t")
            for line in fh:
                f = dict(zip(header, line.rstrip("\n").split("\t")))
                if f["#chrom"] != chrom:
                    continue
                if abs(int(f["left"]) - pos) > args.slop:
                    continue
                if canonical_repeat(f["repeatunit"]) != canon:
                    continue
                called = True
                est = float(f["allele2_est"])
                sum_str = int(f["sum_str_counts"])
                break
        rows.append(
            dict(locus=i, chrom=chrom, pos=pos, repeatunit=unit,
                 true_units=count, called=int(called), allele2_est=est,
                 sum_str_counts=sum_str)
        )
        print(f"[sweep] {tag}: called={called} est={est}", file=sys.stderr)

    out_csv = os.path.join(args.out, "sweep_results.csv")
    with open(out_csv, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    n_exp = sum(1 for r in rows if r["true_units"] * len(r["repeatunit"]) >= 150)
    n_found = sum(
        1 for r in rows if r["true_units"] * len(r["repeatunit"]) >= 150 and r["called"]
    )
    print(f"[sweep] wrote {out_csv}; large-expansion sensitivity {n_found}/{n_exp}")


if __name__ == "__main__":
    main()
