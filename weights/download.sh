#!/usr/bin/env bash
# Fetch the released all-task checkpoint (reference weights/download.sh uses
# the same gdown id) and convert it to an orbax directory for l4p_tpu.
set -euo pipefail
cd "$(dirname "$0")"

CKPT=l4p_depth_flow_2d3dtrack_camray_dynseg_v1.ckpt
FILE_ID=1jN3VHBeDoYWZHFMT7VXV2tVmfadR7WgI
if [ ! -f "$CKPT" ]; then
    if command -v gdown >/dev/null 2>&1; then
        gdown "$FILE_ID" -O "$CKPT"
    else
        # gdown is not installed in this image; Drive's usercontent endpoint
        # with confirm=t skips the large-file interstitial for curl
        curl -fL "https://drive.usercontent.google.com/download?id=${FILE_ID}&export=download&confirm=t" -o "$CKPT"
    fi
fi

python - <<'PY'
from l4p_tpu.checkpoint_io import convert_torch_ckpt
out = convert_torch_ckpt(
    "weights/l4p_depth_flow_2d3dtrack_camray_dynseg_v1.ckpt",
    "weights/l4p_v1_orbax",
    model_config_path="configs/model.yaml",
)
print("converted ->", out)
PY
