"""Shared inference driver: jitted forward cache + per-sequence artifact
writer (panel mp4 + 4D PLY exports).

This is the reference demo's per-sequence body (reference demo/demo.py:66-155:
forward -> generate_video_visualizations -> generate_4D_visualization ->
viser pointer) as a reusable function, used by both the standalone demo and
the CLI `predict` subcommand.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


_FWD_CACHE: Dict[Tuple, object] = {}


def get_forward_fn(cfg, tasks: Sequence[str]):
    """One jitted forward per task set — reused across sequences so repeated
    shapes don't retrace/recompile. The cache value holds a reference to
    `cfg` so its id can never be recycled by a different config object
    (id-keyed caches are only safe while the keyed object stays alive)."""
    key = (id(cfg), tuple(tasks))
    hit = _FWD_CACHE.get(key)
    if hit is None or hit[0] is not cfg:
        from l4p_tpu.models.l4p import l4p_forward

        tt = tuple(tasks)
        fn = jax.jit(
            lambda p, d: l4p_forward(p, cfg, d, tt, key=jax.random.PRNGKey(0))
        )
        _FWD_CACHE[key] = (cfg, fn)
        return fn
    return hit[1]


def run_sequence(
    params,
    cfg,
    tasks: Sequence[str],
    batch: Dict[str, np.ndarray],
    out_dir: str,
    seq_name: str,
    dtype=jnp.bfloat16,
    write_artifacts: bool = True,
) -> Dict[str, np.ndarray]:
    """Run all-task inference on one sequence and write the demo artifacts:
    {seq}_panels.mp4 + per-frame point clouds / camera frusta / 3D-track PLYs
    (reference demo/demo.py:78, :151)."""
    from l4p_tpu.utils.vis import generate_video_visualizations, generate_4d_visualization

    data = {}
    use_u8 = "rgb_u8_bthw3" in batch
    for k, v in batch.items():
        if k == "rgb_b3thw" and use_u8:
            continue  # device gets raw uint8; the float video stays host-side for vis
        if isinstance(v, np.ndarray):
            data[k] = jnp.asarray(v, dtype if k == "rgb_b3thw" else None)

    fwd = get_forward_fn(cfg, tasks)
    t0 = time.time()
    out = fwd(params, data)
    out_np = {k: np.asarray(v, np.float32) for k, v in out.items()}
    dt = time.time() - t0
    t_frames = batch["rgb_b3thw"].shape[2]
    print(f"[{seq_name}] {t_frames} frames in {dt:.2f}s ({t_frames / dt:.1f} fps incl. compile)")
    print(f"[{seq_name}] outputs: {sorted(out_np.keys())}")

    if not write_artifacts:
        return out_np

    os.makedirs(out_dir, exist_ok=True)
    vis_path = generate_video_visualizations(
        batch, out_np, tasks, os.path.join(out_dir, f"{seq_name}_panels.mp4")
    )
    print(f"[{seq_name}] wrote {vis_path}")
    if "depth_est_b1thw" in out_np and "traj3d_est_b16t" in out_np:
        from l4p_tpu.utils.vis import generate_camera_trajectory_ply, generate_3d_track_ply

        seq_dir = os.path.join(out_dir, seq_name)
        plys = generate_4d_visualization(batch, out_np, seq_dir, stride=4)
        n_ply = len(plys)
        if "traj3d_intrinsics_est_b16t" in out_np:  # absent in use_intrinsics configs
            generate_camera_trajectory_ply(out_np, os.path.join(seq_dir, "cameras.ply"))
            n_ply += 1
        if "track_2d_traj_est_bn2t" in out_np and "track_2d_depth_est_bn1t" in out_np:
            n_ply += len(generate_3d_track_ply(batch, out_np, seq_dir))
        print(f"[{seq_name}] wrote {n_ply} point clouds (view: python -c "
              f"\"from l4p_tpu.utils.vis import serve_point_clouds; "
              f"serve_point_clouds('{seq_dir}').serve_forever()\")")
    return out_np
