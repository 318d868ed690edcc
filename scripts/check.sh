#!/usr/bin/env bash
# Commit gate: full test suite + bench smoke. Run before every snapshot.
# Usage: scripts/check.sh [--fast]   (--fast skips the bench smoke)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[check] pytest" >&2
python -m pytest tests/ -q

if [[ "${1:-}" != "--fast" ]]; then
  echo "[check] bench smoke (CPU)" >&2
  JAX_PLATFORMS=cpu timeout 600 python bench.py --smoke
fi

echo "[check] OK" >&2
