#!/usr/bin/env bash
# Fetch the published Omnidata pretrained checkpoints (reference:
# omnidata_tools/torch/tools/download_{depth,surface_normal}_models.sh;
# zenodo mirror of the original gdrive v1/v2 ckpts). The torch checkpoints
# convert to Flax on load: demo.py --checkpoint / train_*.py --pretrained /
# models.create_model(name, checkpoint=...).
#
#   tools/download_models.sh [depth|normal|all]   (default: all)
set -euo pipefail
what="${1:-all}"
mkdir -p pretrained_models
cd pretrained_models
fetch() { [ -f "$(basename "${1%%\?*}")" ] || wget -O "$(basename "${1%%\?*}")" "$1"; }
if [ "$what" = depth ] || [ "$what" = all ]; then
  fetch 'https://zenodo.org/records/10447888/files/omnidata_dpt_depth_v1.ckpt?download=1'
  fetch 'https://zenodo.org/records/10447888/files/omnidata_dpt_depth_v2.ckpt?download=1'
fi
if [ "$what" = normal ] || [ "$what" = all ]; then
  fetch 'https://zenodo.org/records/10447888/files/omnidata_dpt_normal_v2.ckpt?download=1'
  fetch 'https://zenodo.org/records/10447888/files/omnidata_unet_normal_v1.pth?download=1'
fi
echo "checkpoints in $(pwd)"
