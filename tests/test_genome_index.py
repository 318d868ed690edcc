"""Direct unit tests for the genome STR index (core/genome_index.py).

Pins the trim / window-merge / overlap semantics against the reference
(genome_strs.nim:22-92, read_bed.nim:30-50) with hand-built sequences:
boundary-exact starts/stops, the skip-one-window merge allowance, chromosome
edges, and Lapper.find overlap semantics.
"""

import numpy as np
import pytest

from strling_tpu.core.genome_index import (
    STEP,
    WINDOW_SIZE,
    GenomeIndex,
    Window,
    read_str_bed,
    repeat_windows,
    trim,
)
from strling_tpu.io.fasta import Fasta, write_fasta
from strling_tpu.ops import oracle
from strling_tpu.utils.options import Options


def _rand_nonrepeat(rng, n):
    """Random sequence with no STR hit at proportion 0.8 (checked)."""
    while True:
        s = "".join(rng.choice(list("ACGT")) for _ in range(n))
        # ensure no window of 100 detects a repeat
        ok = all(
            oracle.get_repeat(s[i : i + WINDOW_SIZE], 0.8)[1] == 0
            for i in range(0, n, STEP)
        )
        if ok:
            return s


# ---------------------------------------------------------------- trim


def test_trim_left_right_exact():
    # genome_strs.nim:22-59: advance start by k per mismatching kmer until the
    # first kmer matching the repeat's min-rotation code; same from the right.
    # junk 3-mers avoid every rotation of CAG (and of its reverse), so the
    # trim walks all the way to the exact run boundaries.
    rep = "CAG"
    dna = "TTATTATTG" + rep * 10 + "ATTATG"
    w = Window(chrom="c", start=0, stop=len(dna), repeat=rep)
    t = trim(w, dna)
    assert t.start == 9 and t.stop == 39
    assert dna[t.start : t.stop] == rep * 10


def test_trim_noop_when_boundary_exact():
    rep = "AT"
    dna = rep * 20
    w = Window(chrom="c", start=100, stop=100 + len(dna), repeat=rep)
    t = trim(w, dna)
    assert t.start == 100 and t.stop == 100 + len(dna)


def test_trim_min_rotation_phase():
    # the trim comparison is on min-rotation codes, so a phase-shifted run
    # (GCA GCA == rotation of CAG) must NOT be trimmed away.
    rep = "CAG"
    dna = "GCA" * 8  # min-rotation equal to CAG's canonical code
    w = Window(chrom="c", start=0, stop=len(dna), repeat=rep)
    t = trim(w, dna)
    assert t.start == 0 and t.stop == len(dna)


def test_trim_asserts_if_repeat_absent():
    w = Window(chrom="c", start=0, stop=12, repeat="CAG")
    with pytest.raises(AssertionError):
        trim(w, "T" * 12)


# ------------------------------------------------- repeat_windows (merge)


def _windows_for(seq: str, prop=0.8):
    import tempfile, os

    fd, path = tempfile.mkstemp(suffix=".fa")
    os.close(fd)
    try:
        write_fasta(path, {"chrT": seq})
        fai = Fasta(path)
        return list(repeat_windows(fai, Options(proportion_repeat=prop)))
    finally:
        for p in (path, path + ".fai"):
            if os.path.exists(p):
                os.unlink(p)


def test_single_str_run_boundary_exact():
    rng = np.random.default_rng(7)
    import random

    random.seed(7)
    pre = _rand_nonrepeat(random, 300)
    post = _rand_nonrepeat(random, 300)
    run = "CAG" * 60  # 180bp run at [300, 480)
    seq = pre + run + post
    ws = _windows_for(seq)
    assert len(ws) == 1
    w = ws[0]
    assert w.chrom == "chrT"
    assert w.repeat in ("AGC", "CAG", "GCA")
    # trim stops at the FIRST matching min-rotation kmer walking in from the
    # padded bounds (genome_strs.nim:31-36 NOTE: junk rotations can stop the
    # trim early, leaving flank inside the region — reference behavior).
    # The run itself is always fully contained within the padded window.
    assert 200 <= w.start <= 302  # padded start=200; exact-grid stop at 302
    assert 480 <= w.stop <= 560  # run end 480; padded stop=560
    assert seq[302:480] in seq[w.start : w.stop] or (
        w.start <= 302 and w.stop >= 480
    )


def test_merge_consecutive_and_skip_one_window():
    # Two same-unit runs with a 25bp junk gap placed so that exactly one
    # scan window in between goes negative; the skip-one-window allowance
    # (genome_strs.nim:80-81: w.start > last_w.stop + (window_size-step))
    # still merges them into ONE region.
    import random

    random.seed(11)
    pre = _rand_nonrepeat(random, 300)
    post = _rand_nonrepeat(random, 300)
    gap = "GCC" * 8 + "C"  # 25bp junk: window at 420 negative, 480 positive
    seq = pre + "AT" * 75 + gap + "AT" * 100 + post
    ws = _windows_for(seq)
    assert len(ws) == 1
    w = ws[0]
    assert w.repeat in ("AT", "TA")
    # both runs [300,450) and [475,675) contained (trim can stop early in
    # junk on AT/TA false matches — reference behavior)
    assert w.start <= 300 and w.stop >= 675
    assert w.start >= 200 and w.stop <= 775


def test_two_distant_runs_stay_separate():
    import random

    random.seed(13)
    pre = _rand_nonrepeat(random, 300)
    mid = _rand_nonrepeat(random, 400)
    post = _rand_nonrepeat(random, 300)
    seq = pre + "CAG" * 60 + mid + "AAAG" * 45 + post
    ws = _windows_for(seq)
    assert len(ws) == 2
    units = {w.repeat for w in ws}
    # canonical per-window unit strings (min-rotation decode of the kernel)
    assert any(u in ("AGC", "CAG", "GCA") for u in units)
    assert any(set(u) == set("AAG") and len(u) == 4 for u in units)


def test_chromosome_edge_run():
    # run starting at position 0 and a short chromosome: padded bounds clamp
    # to [0, len(chrom_seq)] (genome_strs.nim:82-84)
    import random

    random.seed(17)
    post = _rand_nonrepeat(random, 200)
    seq = "CAG" * 50 + post
    ws = _windows_for(seq)
    assert len(ws) == 1
    assert ws[0].start == 0
    assert ws[0].stop <= len(seq)
    assert ws[0].stop >= 148


def test_min_width_gate_drops_narrow_merged_window():
    # a merged region narrower than window_size - step (40bp) is dropped
    # (genome_strs.nim:81,88). A single positive window is 100bp wide, so
    # only chromosome-tail windows can be narrow: put a short repeat run at
    # the very end of the chromosome inside a final <40bp window.
    import random

    random.seed(23)
    pre = _rand_nonrepeat(random, 600)
    # chromosome length 630: windows start at 0,60,...,600; the last window
    # [600, 630) is 30bp wide < 40
    seq = pre + "A" * 30
    ws = _windows_for(seq)
    assert ws == []


def test_windows_match_oracle_per_window():
    # the batched device scan must agree with the per-window oracle loop
    # (the reference's actual structure, genome_strs.nim:72-74)
    import random

    random.seed(29)
    seq = (
        _rand_nonrepeat(random, 240)
        + "AAGGG" * 36
        + _rand_nonrepeat(random, 180)
    )
    ws = _windows_for(seq)
    # oracle reimplementation of the window loop
    expected = []
    last = Window(stop=-1)
    L = len(seq)
    for s in range(0, L, STEP):
        dna = seq[s : min(L, s + WINDOW_SIZE)]
        rep, cnt = oracle.get_repeat(dna, 0.8)
        if cnt > 0:
            w = Window(chrom="chrT", start=s, stop=s + len(dna), repeat=rep)
            if last.repeat != w.repeat or w.start > last.stop + (WINDOW_SIZE - STEP):
                if last.stop != -1 and last.stop - last.start >= (WINDOW_SIZE - STEP):
                    last.start = max(0, last.start - WINDOW_SIZE)
                    last.stop = min(last.stop + WINDOW_SIZE, L)
                    expected.append(trim(last, seq[last.start : last.stop]))
                last = w
            else:
                last.stop = w.stop
    if last.stop != -1 and last.stop - last.start >= (WINDOW_SIZE - STEP):
        last.start = max(0, last.start - WINDOW_SIZE)
        last.stop = min(last.stop + WINDOW_SIZE, L)
        expected.append(trim(last, seq[last.start : last.stop]))
    assert [(w.chrom, w.start, w.stop, w.repeat) for w in ws] == [
        (w.chrom, w.start, w.stop, w.repeat) for w in expected
    ]


# ------------------------------------------------------------- GenomeIndex


def test_overlaps_lapper_semantics():
    gi = GenomeIndex({"chr1": [(100, 200), (300, 400)]})
    starts = np.array([0, 50, 199, 200, 250, 299, 400, 150])
    stops = np.array([50, 100, 250, 300, 300, 300, 500, 160])
    # Lapper.find: iv.start < stop and iv.stop > start (half-open, touching
    # intervals do NOT overlap)
    got = gi.overlaps("chr1", starts, stops)
    # (299,300) touches (300,400) only at the boundary -> no overlap
    assert got.tolist() == [False, False, True, False, False, False, False, True]


def test_overlaps_unsorted_input_and_nesting():
    gi = GenomeIndex({"c": [(500, 600), (100, 900), (200, 250)]})
    got = gi.overlaps("c", np.array([650, 50, 950]), np.array([700, 60, 1000]))
    # (650,700) is inside (100,900) even though the nearest start (500) ends
    # before it — the prefix-max catches the long enclosing interval
    assert got.tolist() == [True, False, False]


def test_overlaps_missing_chrom():
    gi = GenomeIndex({"chr1": [(0, 10)]})
    assert gi.overlaps("chrX", np.array([0]), np.array([5])).tolist() == [False]


def test_read_str_bed_roundtrip(tmp_path):
    p = tmp_path / "x.bed"
    p.write_text("#comment\ntrack something\nchr1\t10\t20\tCAG\nchr2\t5\t9\tAT\n")
    gi = read_str_bed(str(p))
    assert gi.overlaps("chr1", np.array([15]), np.array([16])).tolist() == [True]
    assert gi.overlaps("chr2", np.array([0]), np.array([5])).tolist() == [False]


# ------------------------------------------- native exact window scan


def _native_scan_mask(seq: str, prop: float, window=WINDOW_SIZE, step=STEP):
    import ctypes as C

    from strling_tpu.core.genome_index import _chrom_zero_mask

    cb = np.frombuffer(seq.encode(), np.uint8)
    mask = _chrom_zero_mask(cb, window, step, prop)
    assert mask is not None, "native library unavailable"
    return mask


def test_native_scan_matches_oracle_random():
    # csrc/genome_scan.cc must agree with the executable spec
    # (ops/oracle.py get_repeat) window by window: mask==1 iff count==0.
    import random

    random.seed(101)
    parts = []
    # random junk, planted repeats of every unit length, N runs, IUPAC
    parts.append("".join(random.choice("ACGT") for _ in range(3000)))
    for unit in ("AT", "CAG", "AAAG", "AAGGG", "AAAGGC"):
        parts.append("".join(random.choice("ACGT") for _ in range(137)))
        parts.append(unit * (240 // len(unit)))
    parts.append("N" * 50)  # N>20 windows must be zero
    parts.append("CAG" * 80)
    parts.append("N" * 15 + "CAG" * 40)  # N<=20: still detectable
    parts.append("".join(random.choice("ACGTNRY") for _ in range(800)))
    seq = "".join(parts)
    for prop in (0.8, 0.5):
        mask = _native_scan_mask(seq, prop)
        L = len(seq)
        for w, s in enumerate(range(0, L, STEP)):
            dna = seq[s : min(L, s + WINDOW_SIZE)]
            _, cnt = oracle.get_repeat(dna, prop)
            assert bool(mask[w]) == (cnt == 0), (w, s, dna)


def test_native_scan_borderline_thresholds():
    # windows sitting exactly at the count threshold (utils.nim:259: strict >)
    # and at the early-exit estimate (utils.nim:251)
    import random

    random.seed(202)
    seqs = []
    for reps in (12, 13, 14, 26, 27):  # around trunc(100*0.8/6)=13 etc.
        junk = "".join(random.choice("ACGT") for _ in range(100 - reps * 6))
        seqs.append("AAGGCT" * reps + junk)
    for reps in (39, 40, 41):
        junk = "".join(random.choice("ACGT") for _ in range(100 - reps * 2))
        seqs.append("AT" * reps + junk)
    seq = ("G" * 40).join(seqs)
    mask = _native_scan_mask(seq, 0.8)
    L = len(seq)
    for w, s in enumerate(range(0, L, STEP)):
        dna = seq[s : min(L, s + WINDOW_SIZE)]
        _, cnt = oracle.get_repeat(dna, 0.8)
        assert bool(mask[w]) == (cnt == 0), (w, s, dna)
