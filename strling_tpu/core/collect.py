"""Per-locus support collection (src/strpkg/collect.nim).

`spanners` re-queries the BAM around a locus and collects three support
classes: spanning fragments, spanning reads and overlapping reads, plus a
diff-array depth profile and the expected number of spanning pairs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from strling_tpu.core.cluster import Bounds
from strling_tpu.core.spanning import cumulative, expected_spanning_probability
from strling_tpu.core.tread import FLAG_DUP, FLAG_SECONDARY, FLAG_SUPPLEMENTARY
from strling_tpu.io.sam import Record
from strling_tpu.utils.fraglen import median, median_depth, percentile

# cigar op indexes: MIDNSHP=X
_CONSUMES_QUERY = {0, 1, 4, 7, 8}
_CONSUMES_REF = {0, 2, 3, 7, 8}


class SupportType:
    SpanningFragment = "SpanningFragment"
    SpanningRead = "SpanningRead"
    OverlappingRead = "OverlappingRead"


@dataclass
class Support:
    """collect.nim:15-31."""

    Type: str = SupportType.SpanningFragment
    SpanningFragmentLength: int = 0
    SpanningFragmentPercentile: float = 0.0
    SpanningReadRepeatCount: int = 0
    SpanningReadCigarInsertionLen: int = 0
    SpanningReadCigarDeletionLen: int = 0
    repeat: str = ""
    qname: str = ""

    def tostring(self, b: Bounds, chrom: str) -> str:  # collect.nim:33-34
        return (
            f"{chrom}\t{b.left}\t{b.right}\t{self.Type}"
            f"\t{self.SpanningFragmentLength}\t{self.SpanningFragmentPercentile}"
            f"\t{self.SpanningReadRepeatCount}\t{self.SpanningReadCigarInsertionLen}"
            f"\t{self.SpanningReadCigarDeletionLen}\t{self.repeat}\t{self.qname}"
        )


def spanning_fragment(L: Record, R: Record, bounds: Bounds, support: Support,
                      frag_sizes: np.ndarray) -> bool:
    """collect.nim:36-48."""
    assert L.start <= R.start
    bound_width = bounds.right - bounds.left
    slop = len(bounds.repeat) - 1
    if bound_width < 5:
        slop += 5 - bound_width
    if L.start < (bounds.left - slop) and R.stop > (bounds.right + slop):
        support.Type = SupportType.SpanningFragment
        support.SpanningFragmentLength = max(1, abs(L.isize))
        support.SpanningFragmentPercentile = percentile(
            frag_sizes, support.SpanningFragmentLength
        )
        support.repeat = bounds.repeat
        support.qname = L.qname
        return True
    return False


def find_read_position(A: Record, position: int) -> int:
    """collect.nim:50-71: project a reference position into read coordinates."""
    r_off = A.start
    q_off = 0
    for length, op in A.cigar:
        if r_off > position:
            return -1
        cq = op in _CONSUMES_QUERY
        cr = op in _CONSUMES_REF
        if cq:
            q_off += length
        if cr:
            r_off += length
        if r_off < position:
            continue
        over = r_off - position
        if over > q_off:
            return -1
        if not cq:
            return -1
        return q_off - over
    return -1


def count_repeat_in_bounds(A: Record, bounds: Bounds) -> int:
    """collect.nim:74-92: repeat units within the bounds via CIGAR projection,
    with the 0.7 purity gate."""
    if bounds.right < bounds.left:
        return 0
    dna = A.seq
    read_left = find_read_position(A, bounds.left)
    read_right = find_read_position(A, bounds.right)
    if read_left >= 0 and read_right < 0:
        read_right = len(dna)
    if read_left < 0 and read_right < 0:
        return 0
    if read_left < 0:
        read_left = 0
    S = dna[read_left:read_right]
    result = S.count(bounds.repeat)
    if result < int(len(S) * 0.7 / len(bounds.repeat)):
        result = 0
    return result


def overlapping_read(A: Record, bounds: Bounds, support: Support) -> bool:
    """collect.nim:96-116."""
    bound_width = bounds.right - bounds.left
    slop = len(bounds.repeat) - 1
    if bound_width < 5:
        slop += 5 - bound_width
    if not (A.tid == bounds.tid and max(A.start, bounds.left) <= min(A.stop, bounds.right)):
        return False
    support.Type = SupportType.OverlappingRead
    support.SpanningReadRepeatCount = count_repeat_in_bounds(A, bounds) & 0xFF
    support.qname = A.qname
    if A.start < (bounds.left - slop) and A.stop > (bounds.right + slop):
        support.Type = SupportType.SpanningRead
        ins = 0
        dele = 0
        for length, op in A.cigar:
            if op == 1:  # I — uint8 accumulation wraps like the reference
                ins = (ins + (length & 0xFF)) & 0xFF
            if op == 2:  # D
                dele = (dele + (length & 0xFF)) & 0xFF
        support.SpanningReadCigarInsertionLen = ins
        support.SpanningReadCigarDeletionLen = dele
    return True


def estimate_size(spanners: list[Support], frag_sizes: np.ndarray) -> int:
    """collect.nim:118-126."""
    small = sorted(
        s.SpanningFragmentLength
        for s in spanners
        if s.SpanningFragmentLength > 0 and s.SpanningFragmentPercentile < 0.01
    )
    if not small:
        return -1
    s = small[int((len(small) - 1) / 2)]
    return median(frag_sizes) - s


def batch_records(batch) -> list[Record]:
    """Materialize light Record objects from a native ReadBatch (window
    queries are small, so per-row objects are fine here)."""
    out = []
    qnames = batch.qnames()
    for i in range(len(batch)):
        cig = batch.cigar_of(i)
        out.append(
            Record(
                qname=qnames[i],
                flag=int(batch.flag[i]),
                tid=int(batch.tid[i]),
                pos=int(batch.pos[i]),
                mapq=int(batch.mapq[i]),
                cigar=[(int(c) >> 4, int(c) & 0xF) for c in cig],
                mate_tid=int(batch.mate_tid[i]),
                mate_pos=int(batch.mate_pos[i]),
                isize=int(batch.isize[i]),
                seq=batch.seq_str(i),
            )
        )
    return out


def spanners(bam, bounds: Bounds, window: int, frag_sizes: np.ndarray,
             min_mapq: int = 20, max_size: int = 5000):
    """collect.nim:130-182. Returns (support list, median_depth,
    expected_spanners float32)."""
    pairs: dict[str, list[Record]] = {}
    window_left = bounds.left - window
    window_right = bounds.right + window
    cd = cumulative(frag_sizes)
    depths = np.zeros(window_right - window_left, np.int64)
    expected_by_qname: dict[str, float] = {}
    support: list[Support] = []

    for batch in bam.query(bounds.tid, max(0, window_left), window_right):
        for aln in batch_records(batch):
            if aln.flag & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY | FLAG_DUP):
                continue
            if aln.mapq < min_mapq:
                continue
            prob = expected_spanning_probability(cd, aln, bounds.left, bounds.right)
            if prob > 0:
                if aln.qname in expected_by_qname:
                    expected_by_qname[aln.qname] = 0.5 * (
                        expected_by_qname[aln.qname] + prob
                    )
                else:
                    expected_by_qname[aln.qname] = prob

            depths[max(0, aln.start - window_left - 1)] += 1
            depths[min(len(depths) - 1, aln.stop - window_left - 1)] -= 1

            s = Support()
            if overlapping_read(aln, bounds, s):
                support.append(s)
            if aln.tid != aln.mate_tid:
                continue
            if abs(aln.isize) > max_size:
                continue
            pairs.setdefault(aln.qname, []).append(aln)
            if len(pairs) > 20_000:
                return [], -1, np.float32(0)

    # float32 accumulator over float64 values (collect.nim:172-173: the tuple
    # field is float32; each += promotes to float64 then narrows on store)
    expected = np.float32(0)
    for v in expected_by_qname.values():
        expected = np.float32(np.float64(expected) + v)

    for qname, pair in pairs.items():
        if len(pair) != 2:
            continue
        s = Support()
        if spanning_fragment(pair[0], pair[1], bounds, s, frag_sizes):
            support.append(s)

    depths = np.cumsum(depths)
    return support, median_depth(depths), expected
