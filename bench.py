"""Benchmark: all-task sliding-window inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the north-star target of 30 fps/chip all-task 224x224 inference
(BASELINE.md; the reference repo publishes no numbers of its own).

Timing notes (axon TPU tunnel):
* block_until_ready does not synchronize — synchronization is a device->host
  scalar pull instead;
* each device->host pull costs a ~29 ms tunnel round-trip, so the harness
  reduces ALL outputs to one on-device scalar and pulls exactly once per
  iteration (the jit execution itself fully materializes every output in
  HBM — the single pull is only a fence).

On any failure (e.g. TPU backend init: the chip is single-tenant and a stale
process can make init raise UNAVAILABLE) the script retries with backoff and,
if still failing, emits a parseable JSON error line instead of a traceback.
"""

import argparse
import json
import sys
import time
import traceback

import numpy as np


def _measure_point(args, frames, queries, params_cache={}):
    import jax
    import jax.numpy as jnp

    import dataclasses

    from l4p_tpu.config import init_l4p_params, load_model_config

    cfg, _ = load_model_config("configs/model.yaml")
    cfg = dataclasses.replace(
        cfg, track=dataclasses.replace(cfg.track, max_queries=queries)
    )
    tasks = tuple(args.tasks.split(","))
    if "params" not in params_cache:
        params_cache["params"] = init_l4p_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    params = params_cache["params"]

    t = frames
    rng = np.random.default_rng(0)
    k = np.tile(np.diag([224.0, 224.0, 1, 1]).astype(np.float32)[None, :, :, None], (1, 1, 1, t))
    k[:, 0, 2] = 112.0
    k[:, 1, 2] = 112.0
    data = {
        "intrinsics_b44t": jnp.asarray(k),
    }
    if args.u8_ingest:
        # production input path: host ships raw uint8, the device normalizes
        # inside the fused ingest matmul (models/ingest.py)
        data["rgb_u8_bthw3"] = jnp.asarray(
            rng.integers(0, 256, (1, t, 224, 224, 3), dtype=np.uint8)
        )
    else:
        data["rgb_b3thw"] = jnp.asarray(rng.standard_normal((1, 3, t, 224, 224)), jnp.bfloat16)
    if "track_2d" in tasks:
        n = queries
        q = np.stack(
            [np.zeros(n) + 0.5, rng.uniform(4, 220, n), rng.uniform(4, 220, n)], -1
        ).astype(np.float32)
        data["track_2d_pointquerries_bn3"] = jnp.asarray(q[None])
        data["track_2d_pointlabels_bn"] = jnp.ones((1, n), jnp.float32)

    # jit returns the FULL output dict: reducing to a scalar inside jit would
    # let XLA dead-code-eliminate whole heads and fake the number.
    # get_forward_fn uses the split-jit InferenceSession for the production
    # task set (separate XLA modules per stage: materially faster cold
    # compile, outputs verified identical to the monolith in
    # tests/test_inference.py) and falls back to one jit otherwise.
    from l4p_tpu.inference import get_forward_fn

    fwd = get_forward_fn(cfg, tasks)

    def run_once():
        out = fwd(params, data)
        # combine one element of EVERY output on-device (tiny op-by-op
        # dispatches), then pull the single scalar: exactly one ~29 ms
        # tunnel round-trip per iteration instead of one per output
        s = jnp.zeros((), jnp.float32)
        for v in out.values():
            s = s + v.reshape(-1)[0].astype(jnp.float32)
        return float(np.asarray(s, dtype=np.float32))

    t0 = time.time()
    run_once()
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(args.iters):
        run_once()
    dt = (time.time() - t0) / args.iters

    fps = t / dt
    detail = {
        "frames": t,
        "seconds_per_video": round(dt, 3),
        "compile_seconds": round(compile_s, 1),
        "tasks": list(tasks),
        "device": str(jax.devices()[0]),
    }
    # analytic matmul-FLOPs + MFU (utils/flops.py): how much of the chip's
    # bf16 peak the whole video actually uses — the honest "is it fast" line
    from l4p_tpu.utils.flops import alltask_video_flops, device_peak_flops, mfu

    stages = alltask_video_flops(cfg, tasks, t, queries if "track_2d" in tasks else 0)
    peak = device_peak_flops()
    detail["model_tflops_per_video"] = round(stages["total"] / 1e12, 2)
    u = mfu(stages["total"], dt, peak)
    if u is not None:
        detail["mfu"] = round(u, 4)
        detail["encoder_tflops_per_video"] = round(stages["encoder"] / 1e12, 2)
    return {
        "metric": f"all_task_fps_per_chip_{t}f_{queries}q",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
        "detail": detail,
    }


def build_and_run(args):
    import jax

    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    # headline = the reference operating point (args defaults: 192f/128q);
    # the 48f/64q point rides along in detail for round-over-round comparison.
    # If the headline point itself fails (e.g. RESOURCE_EXHAUSTED — the
    # 192f/128q graph peaks ~13 GB of 16 GB HBM on the CPU-proxy memory
    # analysis), degrade through known-good points (192f/64q and 48f/128q
    # both ran on hardware in round 2) instead of reporting 0 fps.
    points = [(args.frames, args.queries), (args.frames, 64), (48, 128), (48, 64)]
    # never escalate past the requested point: a user who sized the run down
    # should not pay a multi-minute compile for a BIGGER graph on fallback
    points = [p for p in points if p[0] <= args.frames and p[1] <= args.queries]
    seen = set()
    result = None
    measured = None
    headline_err = None
    for fr, qn in points:
        if (fr, qn) in seen:
            continue
        seen.add((fr, qn))
        try:
            result = _measure_point(args, fr, qn)
            measured = (fr, qn)
            if (fr, qn) != (args.frames, args.queries):
                result["detail"]["fallback_from"] = {
                    "frames": args.frames, "queries": args.queries,
                    "error": str(headline_err)[:200],
                }
            break
        except Exception as e:  # noqa: BLE001 — degrade, don't zero the bench
            if headline_err is None:
                headline_err = e
            msg = str(e)
            # transient backend errors should bubble to the retry loop
            if "UNAVAILABLE" in msg or "backend" in msg.lower():
                raise
    if result is None:
        raise headline_err
    if measured != (48, 64):
        try:
            sec = _measure_point(args, 48, 64)
            result["detail"]["secondary"] = {
                "metric": sec["metric"],
                "value": sec["value"],
                "seconds_per_video": sec["detail"]["seconds_per_video"],
            }
        except Exception as e:  # noqa: BLE001 — secondary point must not kill the headline
            result["detail"]["secondary"] = {"error": str(e)[:200]}
    return result


def main():
    ap = argparse.ArgumentParser()
    # defaults are the REFERENCE operating point: 192-frame max video length
    # (reference video_dataset.py:23) and 128 tracking queries (the memory
    # governor default, demo/demo.py:24-25; 64 only under limit_gpu_mem_usage)
    ap.add_argument("--frames", type=int, default=192, help="video length (multiple of 8)")
    ap.add_argument("--queries", type=int, default=128, help="tracking queries")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tasks", type=str, default="flow_2d_backward,track_2d,depth,dyn_mask,camray")
    ap.add_argument("--retries", type=int, default=3, help="backend-init retries with backoff")
    ap.add_argument("--u8-ingest", dest="u8_ingest", action="store_true", default=True,
                    help="ship uint8 video, normalize on device (default)")
    ap.add_argument("--float-input", dest="u8_ingest", action="store_false")
    args = ap.parse_args()

    last_err = None
    last_tb = ""
    for attempt in range(args.retries):
        try:
            result = build_and_run(args)
            print(json.dumps(result))
            return 0
        except Exception as e:  # noqa: BLE001 — must never print a bare traceback
            last_err = e
            # capture while the exception is active — outside the except
            # block format_exc() sees no exception and reports 'NoneType: None'
            last_tb = traceback.format_exc()
            msg = str(e)
            transient = "UNAVAILABLE" in msg or "backend" in msg.lower()
            if attempt + 1 < args.retries and transient:
                time.sleep(10.0 * (attempt + 1))
                continue
            break

    print(json.dumps({
        "metric": "all_task_fps_per_chip",
        "value": 0.0,
        "unit": "fps",
        "vs_baseline": 0.0,
        "error": f"{type(last_err).__name__}: {str(last_err)[:400]}",
        "traceback_tail": last_tb.splitlines()[-3:],
    }))
    return 1


if __name__ == "__main__":
    sys.exit(main())
