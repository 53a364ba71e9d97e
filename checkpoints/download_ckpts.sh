#!/bin/bash
# Download the SAM 2.1 torch checkpoints (public Meta URLs, same as the
# reference sam2/checkpoints/download_ckpts.sh) for conversion via
#   python -m sam2_opt_tpu.io.checkpoints convert <ckpt>.pt <out_dir>
set -e
if command -v wget &>/dev/null; then CMD="wget"; else CMD="curl -L -O"; fi
BASE="https://dl.fbaipublicfiles.com/segment_anything_2/092824"
for name in sam2.1_hiera_tiny sam2.1_hiera_small sam2.1_hiera_base_plus sam2.1_hiera_large; do
  echo "Downloading ${name}.pt ..."
  $CMD "${BASE}/${name}.pt" || { echo "failed: ${name}"; exit 1; }
done
echo "Done. Convert with: python -m sam2_opt_tpu.io.checkpoints convert sam2.1_hiera_large.pt ckpt/large"
