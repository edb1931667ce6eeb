#!/usr/bin/env bash
# Fetch the released all-task checkpoint (reference weights/download.sh uses
# the same gdown id) and convert it to an orbax directory for l4p_tpu.
set -euo pipefail
cd "$(dirname "$0")"

CKPT=l4p_depth_flow_2d3dtrack_camray_dynseg_v1.ckpt
if [ ! -f "$CKPT" ]; then
    gdown 1jN3VHBeDoYWZHFMT7VXV2tVmfadR7WgI -O "$CKPT"
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
