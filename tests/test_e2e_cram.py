"""End-to-end joint pipeline on CRAM inputs: extract -> merge -> call must
produce byte-identical artifacts to the BAM path (the reference treats the
formats interchangeably via htslib)."""

import numpy as np
import pytest

from strling_tpu.core.call import run_call
from strling_tpu.core.extract import extract
from strling_tpu.core.merge import run_merge
from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam
from strling_tpu.io.bam import Bam
from strling_tpu.io.bamwrite import BamRecord
from strling_tpu.io.binfmt import write_bin
from strling_tpu.io.cramwrite import write_cram
from strling_tpu.io.fasta import build_fai, write_fasta

LOCUS = 20000


@pytest.fixture(scope="module")
def both_formats(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e_cram")
    rng = np.random.default_rng(21)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 40000)])
    seq = seq[:LOCUS] + "CAG" * 10 + seq[LOCUS:]
    write_fasta(str(d / "ref.fa"), {"chr1": seq})
    build_fai(str(d / "ref.fa"), str(d / "ref.fa.fai"))
    hist = normal_hist(400, 50)
    for s, counts, seed in [("s1", (0, 100), 1), ("s2", (0, 0), 2)]:
        bam_p = str(d / f"{s}.bam")
        simulate_str_bam(str(d / "ref.fa"),
                         [Allele("chr1", LOCUS, counts, "CAG")],
                         bam_p, hist, depth=30, flank=6000, seed=seed)
        bam = Bam(bam_p)
        recs = []
        for batch in bam.batches():
            for i in range(len(batch)):
                cig = [(int(c) >> 4, int(c) & 0xF) for c in batch.cigar_of(i)]
                recs.append(BamRecord(
                    batch.qname(i), int(batch.flag[i]), int(batch.tid[i]),
                    int(batch.pos[i]), int(batch.mapq[i]), cig,
                    int(batch.mate_tid[i]), int(batch.mate_pos[i]),
                    int(batch.isize[i]), batch.seq_str(i)))
        write_cram(str(d / f"{s}.cram"), bam.header_text,
                   [(t.name, t.length) for t in bam.targets], recs,
                   fasta=str(d / "ref.fa"), slice_size=500)
    return d


def test_joint_pipeline_cram_equals_bam(both_formats):
    d = both_formats
    fa = str(d / "ref.fa")
    out = {}
    for fmt in ("bam", "cram"):
        bins = []
        for s in ("s1", "s2"):
            h = Bam(str(d / f"{s}.{fmt}"), fasta=fa)
            treads, fd, _ = extract(h, None, None)
            binp = str(d / f"{fmt}_{s}.bin")
            write_bin(binp, treads, fd, h.header_text, 0.8, 40)
            bins.append(binp)
        run_merge(bins, output_prefix=str(d / f"{fmt}_joint"))
        for s in ("s1", "s2"):
            run_call(str(d / f"{s}.{fmt}"), str(d / f"{fmt}_{s}.bin"), fasta=fa,
                     bounds_path=str(d / f"{fmt}_joint-bounds.txt"),
                     output_prefix=str(d / f"{fmt}_{s}"))
        out[fmt] = {
            "bins": [open(b, "rb").read() for b in bins],
            "bounds": open(str(d / f"{fmt}_joint-bounds.txt")).read(),
            "gt": [open(str(d / f"{fmt}_{s}-genotype.txt")).read()
                   for s in ("s1", "s2")],
        }
    assert out["bam"]["bins"] == out["cram"]["bins"]
    assert out["bam"]["bounds"] == out["cram"]["bounds"]
    assert out["bam"]["gt"] == out["cram"]["gt"]
    assert "CAG" in out["cram"]["bounds"] or "AGC" in out["cram"]["bounds"]
