"""Mismapping realism: pure-STR reads placed at same-unit decoy loci (as
bwa does) must be recovered by extract's mate rescue — STRling's core
feature (README.md:9; adjust_by, extract.nim:141-179)."""

import numpy as np

from strling_tpu.core.call import run_call
from strling_tpu.core.extract import extract
from strling_tpu.core.simulate import Allele, normal_hist, simulate_str_bam
from strling_tpu.io.bam import Bam
from strling_tpu.io.binfmt import write_bin
from strling_tpu.io.fasta import build_fai, write_fasta

LOCUS = 30000


def _ref(tmp_path, rng):
    g1 = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 60000)])
    g1 = g1[:LOCUS] + "CAG" * 10 + g1[LOCUS:]
    g2 = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 40000)])
    decoys = []
    off = 0
    for dpos in (8000, 20000, 32000):
        decoys.append(("chr2", dpos + off))
        g2 = g2[: dpos + off] + "CAG" * 15 + g2[dpos + off:]
        off += 45
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, {"chr1": g1, "chr2": g2})
    build_fai(fa, fa + ".fai")
    return fa, decoys


def test_mismapped_reads_recovered_by_mate(tmp_path):
    rng = np.random.default_rng(3)
    fa, decoys = _ref(tmp_path, rng)
    hist = normal_hist(400, 50)
    bam_p = str(tmp_path / "mis.bam")
    simulate_str_bam(fa, [Allele("chr1", LOCUS, (0, 120), "CAG")], bam_p,
                     hist, depth=30, flank=9000, seed=5,
                     decoys={"CAG": decoys}, mismap_rate=1.0)
    bam = Bam(bam_p)
    # the decoy placements really happened: mapq-0 pure-STR reads on chr2
    n_decoy = 0
    for batch in bam.batches():
        for i in range(len(batch)):
            if batch.tid[i] == 1 and batch.mapq[i] == 0:
                n_decoy += 1
    assert n_decoy > 10, n_decoy
    tb, frag, _ = extract(Bam(bam_p), None, None)
    # mate rescue: repeat treads repositioned to chr1 near the locus
    data = tb.data
    agc = data["repeat"] == b"AGC"
    near = agc & (data["tid"] == 0) & (np.abs(
        data["position"].astype(np.int64) - LOCUS) < 1200)
    assert near.sum() >= n_decoy // 2, (near.sum(), n_decoy)
    # and the expansion still genotypes at the locus
    binp = str(tmp_path / "mis.bin")
    write_bin(binp, tb, frag, bam.header_text, 0.8, 40)
    run_call(bam_p, binp, output_prefix=str(tmp_path / "out"))
    lines = open(str(tmp_path / "out-genotype.txt")).read().splitlines()[1:]
    hit = [l for l in lines if l.startswith("chr1") and
           abs(int(l.split("\t")[1]) - LOCUS) < 1200]
    assert hit, lines
    est = float(hit[0].split("\t")[5])
    assert est > 50, est  # large-allele estimate reflects the expansion
