#!/usr/bin/env bash
# Joint-calling STRling pipeline: extract per sample -> merge -> call per
# sample against the merged bounds -> cohort outliers.
# (Equivalent of the reference's pipelines/strling-joint.groovy.)
#
# Usage: strling-joint.sh REF.fasta OUT_DIR BAM [BAM...]
# Env:   STRLING, LOCI as in strling-individual.sh
#        JOBS=N    parallel extract/call fan-out (default 1)
set -euo pipefail

REF=$1; OUT=$2; shift 2
STRLING=${STRLING:-"python -m strling_tpu.cli"}
JOBS=${JOBS:-1}
mkdir -p "$OUT"

STRFILE="$OUT/$(basename "$REF").str"
[ -e "$STRFILE" ] || $STRLING index -g "$STRFILE" "$REF"

extract_one() {
  BAM=$1
  S=$(basename "$BAM" .bam)
  $STRLING extract -f "$REF" -g "$STRFILE" "$BAM" "$OUT/$S.bin"
}
export -f extract_one 2>/dev/null || true

BINS=()
for BAM in "$@"; do
  S=$(basename "$BAM" .bam)
  BINS+=("$OUT/$S.bin")
done

i=0
for BAM in "$@"; do
  extract_one "$BAM" &
  i=$((i+1)); [ $((i % JOBS)) -eq 0 ] && wait
done
wait

$STRLING merge -f "$REF" ${LOCI:+-l "$LOCI"} -o "$OUT/joint" "${BINS[@]}"

for BAM in "$@"; do
  S=$(basename "$BAM" .bam)
  $STRLING call -f "$REF" -b "$OUT/joint-bounds.txt" -o "$OUT/$S" "$BAM" "$OUT/$S.bin"
done

$STRLING outliers \
  --genotypes "$OUT"/*-genotype.txt \
  --unplaced "$OUT"/*-unplaced.txt \
  --out "$OUT/cohort."
