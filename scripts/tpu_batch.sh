#!/usr/bin/env bash
# Serialized TPU work queue for when the axon tunnel returns.
#
# The tunnel was down for most of round-3's second half; this runs the
# hardware-blocked items in priority order, ONE at a time (concurrent TPU
# processes corrupt each other's timings and can wedge the chip —
# ROUND_NOTES "Axon Pallas gotcha"). Each step logs to runs/tpu_batch/.
#
#   bash scripts/tpu_batch.sh            # everything
#   bash scripts/tpu_batch.sh bench      # just the benchmark
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p runs/tpu_batch
TS=$(date +%Y%m%d_%H%M%S)
LOG=runs/tpu_batch/$TS
mkdir -p "$LOG"
STEP=${1:-all}

run() { # name timeout cmd...
    local name=$1 to=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG/summary.txt"
    timeout "$to" "$@" >"$LOG/$name.log" 2>&1
    local rc=$?
    tail -3 "$LOG/$name.log" | tee -a "$LOG/summary.txt"
    echo "--- rc=$rc" | tee -a "$LOG/summary.txt"
}

# 0. is the chip reachable at all? (45 s: backend init is ~5 s when healthy)
run probe 60 python -c "import jax; print(jax.devices())" || true
grep -q "TPU" "$LOG/probe.log" || { echo "TUNNEL STILL DOWN" | tee -a "$LOG/summary.txt"; exit 1; }

if [ "$STEP" = all ] || [ "$STEP" = bench ]; then
    # 1. THE driver artifact: headline 192f/128q + 48f/64q secondary.
    #    First run may pay device-side Pallas program builds (2-6 min/shape).
    run bench 3600 python bench.py
fi
if [ "$STEP" = all ] || [ "$STEP" = ablate ]; then
    # 2. attribute all-task time (VERDICT r2 item 1: the ~150 ms mystery)
    run ablate_48f_64q 2400 python scripts/ablate_alltask.py --queries 64 --frames 48
fi
if [ "$STEP" = all ] || [ "$STEP" = twoway ]; then
    # 3. factored two-way transformer on-chip numbers (landed unmeasured)
    run twoway 1200 python scripts/verify_twoway_tpu.py
fi
if [ "$STEP" = all ] || [ "$STEP" = entry ]; then
    # 4. warm the driver's compile-check path
    run entry 1200 python -c "import __graft_entry__ as g; import numpy as np; fn, args = g.entry(); o = fn(*args); import jax; print('entry ok', np.asarray(jax.tree_util.tree_leaves(o)[0].reshape(-1)[0]))"
fi
if [ "$STEP" = all ] || [ "$STEP" = encvar ]; then
    # 5. encoder micro-variants (locates the scan/fp32-materialization cost)
    run encvar 2400 python scripts/exp_encoder_variants.py
fi
if [ "$STEP" = all ] || [ "$STEP" = stream ]; then
    # 6. streaming steady-state window latency (README real-time claim)
    run stream 2400 python scripts/stream_bench.py
fi
echo "DONE -> $LOG/summary.txt"
