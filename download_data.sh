#!/bin/bash
# Download LagrangeBench datasets from Zenodo into ./datasets (or $1).
# Usage: ./download_data.sh [all|tgv2d|rpf2d|ldc2d|dam2d|tgv3d|rpf3d|ldc3d] [outdir]
set -euo pipefail

NAME="${1:-all}"
OUT="${2:-datasets}"
BASE="https://zenodo.org/records/10491868/files"

declare -A FILES=(
  [tgv2d]=2D_TGV_2500_10kevery100.zip
  [rpf2d]=2D_RPF_3200_20kevery100.zip
  [ldc2d]=2D_LDC_2708_10kevery100.zip
  [dam2d]=2D_DAM_5740_20kevery100.zip
  [tgv3d]=3D_TGV_8000_10kevery100.zip
  [rpf3d]=3D_RPF_8000_10kevery100.zip
  [ldc3d]=3D_LDC_8160_10kevery100.zip
)

mkdir -p "$OUT"

fetch() {
  local zip="${FILES[$1]}"
  echo "downloading $1 ($zip)..."
  curl -L --fail -o "$OUT/$zip" "$BASE/$zip"
  (cd "$OUT" && unzip -oq "$zip" && rm "$zip")
}

if [[ "$NAME" == "all" ]]; then
  for k in "${!FILES[@]}"; do fetch "$k"; done
else
  [[ -n "${FILES[$NAME]:-}" ]] || { echo "unknown dataset: $NAME"; exit 1; }
  fetch "$NAME"
fi
echo "done; datasets in $OUT/"
