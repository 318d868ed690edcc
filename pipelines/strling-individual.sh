#!/usr/bin/env bash
# Single-sample STRling pipeline: index -> extract -> call.
# (Equivalent of the reference's pipelines/strling-individual.groovy.)
#
# Usage: strling-individual.sh REF.fasta OUT_DIR BAM [BAM...]
# Env:   STRLING="python -m strling_tpu.cli"   override the CLI
#        LOCI=path.bed                         optional --loci for call
set -euo pipefail

REF=$1; OUT=$2; shift 2
STRLING=${STRLING:-"python -m strling_tpu.cli"}
mkdir -p "$OUT"

STRFILE="$OUT/$(basename "$REF").str"
if [ ! -e "$STRFILE" ]; then
  $STRLING index -g "$STRFILE" "$REF"
fi

for BAM in "$@"; do
  S=$(basename "$BAM" .bam)
  $STRLING extract -f "$REF" -g "$STRFILE" "$BAM" "$OUT/$S.bin"
  $STRLING call -f "$REF" ${LOCI:+-l "$LOCI"} -o "$OUT/$S" "$BAM" "$OUT/$S.bin"
done
