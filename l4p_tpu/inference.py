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


class InferenceSession:
    """Split-jit all-task inference: encoder / stacked dense heads / camray
    solve / tracking / stitching compile as SEPARATE XLA modules.

    The monolithic jit pays ~30 s of whole-module optimization passes on top
    of the sum of its parts (CPU proxy: 88 s monolith vs ~57 s sum — VERDICT
    r2 item 9); the split session's cold compile is the sum. Runtime is
    unchanged: stages chain through on-device arrays with async dispatch, no
    host syncs, and the TPU executes one program at a time anyway. Outputs
    match l4p_forward bitwise in fp32 and within 1e-5 under bf16/XLA
    refusion (tests/test_inference.py, tests/test_encoder_options.py).

    Supports the production path: forward-direction tracking, no mesh,
    >=2 stackable dense heads. `supported()` gates construction;
    get_forward_fn falls back to the monolithic jit otherwise.

    `unroll_encoder`: None (default) unrolls the encoder blocks in the
    session's encode stage (the on-chip win, see __init__ body); False keeps
    the config's own `encoder.unroll_blocks` — use it to skip the ~38 s
    extra cold compile on one-off runs or to debug the lax.scan path.
    """

    def __init__(self, cfg, tasks: Sequence[str], key=None, unroll_encoder=None):
        import dataclasses

        from l4p_tpu.models import l4p as L

        self.cfg = cfg
        self.tasks = tuple(tasks)
        # Unrolled encoder blocks for the session's encode stage: on-chip
        # (v5e) the giant window drops 54.3 -> 48.1 ms/window because the
        # lax.scan's per-step dynamic-slice param copies (~50 MB/block) go
        # away (scripts/exp_encoder_variants.py). Numerically transparent in
        # fp32; within 1e-5 under bf16 XLA refusion
        # (tests/test_encoder_options.py); costs ~38 s of extra cold compile
        # on the encoder module only, paid once across operating points.
        # matmul_out_compute_dtype measured a wash on chip (54.8 ms) — off.
        enc_cfg = cfg
        if unroll_encoder is None:
            unroll_encoder = True
        if unroll_encoder and not cfg.encoder.unroll_blocks:
            enc_cfg = dataclasses.replace(
                cfg, encoder=dataclasses.replace(cfg.encoder, unroll_blocks=True)
            )
        self.key = jax.random.PRNGKey(0) if key is None else key
        heads = cfg.head_dict
        ws, stride = cfg.window_size[0], cfg.window_stride_t
        img_info = (ws, *cfg.window_size[1:])
        self._img_info = img_info
        joint = cfg.joint_alignment and ("depth" in self.tasks) and ("camray" in self.tasks)
        self._joint = joint

        # only the keys the encoder consumes: extra dict entries (tracking
        # queries) in the jit signature would retrace the most expensive
        # stage whenever the query count changes (per-sequence grid sampling)
        _ENC_KEYS = ("rgb_b3thw", "rgb_u8_bthw3", "intrinsics_b44t", "extrinsics_b44t")
        self._enc_keys = _ENC_KEYS
        self._enc = jax.jit(
            lambda p, d: L.encode_windows(
                p, enc_cfg, d.get("rgb_b3thw"), d.get("intrinsics_b44t"),
                d.get("extrinsics_b44t"), rgb_u8_bthw3=d.get("rgb_u8_bthw3"),
            )
        )
        self._dense = jax.jit(
            lambda hp, hooks: L.run_dense_heads_stacked(hp, cfg, hooks, self.tasks, img_info)
        )
        if "camray" in self.tasks:
            hc = heads["camray"]

            # two modules, not one: the DPT head and the deep linalg solve
            # graph compiled together pay ~26 s of extra whole-module passes
            # on the CPU proxy (47.1 s fused vs 7.3 + 13.5 split)
            def camray_rays(hp, hooks):
                feats = [hooks[h_] for h_ in hc.dpt.hooks]
                nw = feats[0].shape[0]
                one = lambda fw: L.dense_head_raw(hp["camray"], hc, fw, img_info)
                return jax.lax.map(
                    one, feats, batch_size=L._map_batch(nw, cfg.dense_window_chunk)
                ).astype(jnp.float32)

            self._camray_rays = jax.jit(camray_rays)
            self._camray_solve = jax.jit(
                lambda rays, intr: L.camray_windows_to_cameras(
                    rays, hc, img_info, intr, stride, jax.random.fold_in(self.key, 7)
                )
            )
        if "track_2d" in self.tasks:
            self._track = jax.jit(
                lambda tp, final, q, l: L.run_track_chunked(tp, cfg.track, final, q, l, stride)
            )

        def stitch_stage(dense_outs, pose_w, intr_w):
            # t_total reconstructed from the window count is exact:
            # encode_windows asserts (T - ws) % stride == 0 (tail frames are
            # never silently dropped), so T == (nw - 1) * stride + ws
            nw = next(iter(dense_outs.values())).shape[0]
            t_total = (nw - 1) * stride + ws
            return L.stitch_dense_outputs(
                cfg, self.tasks, dense_outs, pose_w, intr_w, stride, t_total, self.key
            )

        self._stitch = jax.jit(stitch_stage)

    @staticmethod
    def supported(cfg, tasks: Sequence[str]) -> bool:
        import dataclasses

        heads = cfg.head_dict
        known = {"track_2d", "flow_2d_backward", "dyn_mask", "depth", "camray"}
        if not set(tasks) <= known:
            return False
        if "track_2d" in tasks and tuple(cfg.track.estimation_directions) != (1,):
            return False
        if "camray" in tasks and heads.get("camray") is not None and heads["camray"].kind != "camray":
            return False  # a camera_rays-kind head stitches raw rays, not poses
        # the stitch stage requires EVERY dense task to come out of the
        # stacked body — apply run_dense_heads_stacked's own structural
        # filter (identical dpt configs modulo out-channels), not just the
        # kind check, so a heterogeneous custom config (e.g. different
        # hooks_idx per head) falls back to the monolith instead of a
        # trace-time KeyError
        dense = [t for t in tasks if t in heads and heads[t].kind in ("flow", "depth", "dyn_mask")]
        if len(dense) < 2:
            return False
        stackable = [
            t for t in dense
            if heads[t].dpt == dataclasses.replace(
                heads[dense[0]].dpt, num_channels=heads[t].dpt.num_channels
            )
        ]
        return stackable == dense

    def __call__(self, params, data: Dict) -> Dict:
        enc_data = {k: data[k] for k in self._enc_keys if k in data}
        enc = self._enc(params["video_encoder"], enc_data)
        hooks, final = enc["hooks"], enc["final"]
        dense = self._dense(params["task_heads"], hooks)
        pose_w = intr_w = None
        if "camray" in self.tasks:
            rays = self._camray_rays(params["task_heads"], hooks)
            pose_w, intr_w = self._camray_solve(rays, data.get("intrinsics_b44t"))
        # drop the hook pyramid before the track stage dispatches: the track
        # scan is the peak-memory stage (~9.7 GB temps at 128 queries on the
        # 192f memory analysis) and only needs `final`; freeing the 5-level
        # pyramid (~0.75 GB at 192f) once dense/camray complete gives the
        # allocator headroom on the 16 GB chip
        del hooks, enc
        out = dict(self._stitch(dense, pose_w, intr_w))
        del dense
        if "track_2d" in self.tasks:
            out.update(
                self._track(
                    params["task_heads"]["track_2d"], final,
                    data["track_2d_pointquerries_bn3"], data["track_2d_pointlabels_bn"],
                )
            )
        return out


def get_forward_fn(cfg, tasks: Sequence[str], split: bool = True):
    """One jitted forward per task set — reused across sequences so repeated
    shapes don't retrace/recompile. The cache value holds a reference to
    `cfg` so its id can never be recycled by a different config object
    (id-keyed caches are only safe while the keyed object stays alive).

    With `split` (default), the production task sets run as an
    InferenceSession (separate XLA modules per stage — materially faster
    cold compile, identical outputs); anything the session doesn't support
    falls back to the monolithic jit."""
    key = (id(cfg), tuple(tasks), bool(split))
    hit = _FWD_CACHE.get(key)
    if hit is None or hit[0] is not cfg:
        tt = tuple(tasks)
        if split and InferenceSession.supported(cfg, tt):
            fn = InferenceSession(cfg, tt)
        else:
            from l4p_tpu.models.l4p import l4p_forward

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
    stream: bool = False,
) -> Dict[str, np.ndarray]:
    """Run all-task inference on one sequence and write the demo artifacts:
    {seq}_panels.mp4 + per-frame point clouds / camera frusta / 3D-track PLYs
    (reference demo/demo.py:78, :151).

    With `stream`, frames go through StreamingL4P one window-stride at a time
    (the online serving path, outputs identical to offline — streaming.py);
    artifacts are written once at the end either way."""
    from l4p_tpu.utils.vis import generate_video_visualizations, generate_4d_visualization

    use_u8 = "rgb_u8_bthw3" in batch
    # in stream mode the video (and intrinsics) go to the device
    # window-by-window inside StreamingL4P — uploading the whole clip here
    # would be a redundant host->device copy pinned in HBM for the whole run
    skip = {"rgb_b3thw"} if use_u8 else set()
    if stream:
        skip |= {"rgb_u8_bthw3", "intrinsics_b44t"}
    data = {}
    for k, v in batch.items():
        if k in skip:
            continue
        if isinstance(v, np.ndarray):
            data[k] = jnp.asarray(v, dtype if k == "rgb_b3thw" else None)

    t0 = time.time()
    if stream:
        if not use_u8:
            raise ValueError("streaming mode needs uint8 frames (dataset emit_uint8)")
        from l4p_tpu.streaming import StreamingL4P, assemble_emissions

        s = StreamingL4P(
            params, cfg, tasks,
            queries_bn3=data.get("track_2d_pointquerries_bn3"),
            labels_bn=data.get("track_2d_pointlabels_bn"),
        )
        rgb = batch["rgb_u8_bthw3"]
        intr = batch.get("intrinsics_b44t")
        ws, stride = cfg.window_size[0], cfg.window_stride_t
        emits, lo = [], 0
        t_frames_u8 = rgb.shape[1]
        while lo < t_frames_u8:
            hi = min(lo + (ws if lo == 0 else stride), t_frames_u8)
            emits += s.push(rgb[:, lo:hi], None if intr is None else intr[:, :, :, lo:hi])
            lo = hi
        emits.append(s.flush())
        out = assemble_emissions(emits)
    else:
        fwd = get_forward_fn(cfg, tasks)
        out = fwd(params, data)
    out_np = {k: np.asarray(v, np.float32) for k, v in out.items()}
    dt = time.time() - t0
    t_frames = batch["rgb_b3thw"].shape[2]
    mode = "streamed" if stream else "in"
    print(f"[{seq_name}] {t_frames} frames {mode} {dt:.2f}s ({t_frames / dt:.1f} fps incl. compile)")
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
