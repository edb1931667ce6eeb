#!/usr/bin/env bash
# Environment setup (reference parity: /root/reference/env/install.sh).
# Usage: bash env/install.sh [--cpu]
#   default: installs jax[tpu] (requires a Cloud TPU VM)
#   --cpu:   CPU-only jax (tests, virtual-mesh sharding checks)
set -euo pipefail
cd "$(dirname "$0")/.."

PIP=${PIP:-pip}

if [ "${1:-}" = "--cpu" ]; then
    $PIP install "jax>=0.4.35"
else
    $PIP install "jax[tpu]>=0.4.35" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
fi

grep -v '^jax' env/requirements.txt | $PIP install -r /dev/stdin

# smoke check
python - <<'PY'
import jax
print("devices:", jax.devices())
import l4p_tpu  # noqa: F401  (repo root on sys.path / pip install -e .)
print("l4p_tpu importable")
PY

echo "Done. Fetch weights with: bash weights/download.sh"
