#!/usr/bin/env bash
# Joint calling with the merge step sharded per chromosome (for large cohorts
# where whole-genome merge memory is the bottleneck — the reference's
# strling-joint-bychrom.groovy; memory drops from ~63MB to ~5MB per sample).
#
# Usage: strling-joint-bychrom.sh REF.fasta OUT_DIR "chr1 chr2 ..." BAM [BAM...]
set -euo pipefail

REF=$1; OUT=$2; CHROMS=$3; shift 3
STRLING=${STRLING:-"python -m strling_tpu.cli"}
mkdir -p "$OUT"

STRFILE="$OUT/$(basename "$REF").str"
[ -e "$STRFILE" ] || $STRLING index -g "$STRFILE" "$REF"

BINS=()
for BAM in "$@"; do
  S=$(basename "$BAM" .bam)
  $STRLING extract -f "$REF" -g "$STRFILE" "$BAM" "$OUT/$S.bin"
  BINS+=("$OUT/$S.bin")
done

# per-chromosome merges, then concatenate (header from the first)
FIRST=1
for C in $CHROMS; do
  $STRLING merge -f "$REF" --chromosome "$C" -o "$OUT/joint-$C" "${BINS[@]}"
  if [ $FIRST -eq 1 ]; then
    cp "$OUT/joint-$C-bounds.txt" "$OUT/joint-bounds.txt"
    FIRST=0
  else
    tail -n +2 "$OUT/joint-$C-bounds.txt" >> "$OUT/joint-bounds.txt"
  fi
done

for BAM in "$@"; do
  S=$(basename "$BAM" .bam)
  $STRLING call -f "$REF" -b "$OUT/joint-bounds.txt" -o "$OUT/$S" "$BAM" "$OUT/$S.bin"
done

$STRLING outliers \
  --genotypes "$OUT"/*-genotype.txt \
  --unplaced "$OUT"/*-unplaced.txt \
  --out "$OUT/cohort."
