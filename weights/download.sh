#!/usr/bin/env bash
# Fetch the released all-task checkpoint (reference weights/download.sh uses
# the same gdown id) and convert it to an orbax directory for l4p_tpu.
set -euo pipefail
cd "$(dirname "$0")"

CKPT=l4p_depth_flow_2d3dtrack_camray_dynseg_v1.ckpt
FILE_ID=1jN3VHBeDoYWZHFMT7VXV2tVmfadR7WgI
if [ ! -f "$CKPT" ]; then
    # download to a temp name and move only on success: an interrupted
    # transfer or an HTML quota page (Drive serves those with HTTP 200, so
    # curl -f passes) must not leave a stale $CKPT that blocks re-download
    TMP=$CKPT.part
    if command -v gdown >/dev/null 2>&1; then
        gdown "$FILE_ID" -O "$TMP"
    else
        # gdown is not installed in this image; Drive's usercontent endpoint
        # with confirm=t skips the large-file interstitial for curl
        curl -fL "https://drive.usercontent.google.com/download?id=${FILE_ID}&export=download&confirm=t" -o "$TMP"
    fi
    # sanity: a real torch checkpoint is a multi-GB zip, not a small HTML page
    if [ "$(stat -c %s "$TMP")" -lt 1000000 ] || head -c 15 "$TMP" | grep -qi "<!DOCTYPE\|<html"; then
        echo "download produced a non-checkpoint file (quota page?); keeping $TMP for inspection" >&2
        exit 1
    fi
    mv "$TMP" "$CKPT"
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
