"""Online (streaming) all-task inference with offline-identical outputs.

The reference is strictly offline: `L4P_VideoMAE.forward` requires the whole
video up front and loops its sliding windows in Python (reference:
l4p/models/l4p_videomae.py:256-330). But every cross-window dependency in the
model is *causal* — the depth/Sim(3) aligners chain each window to the
previous aligned window (dense_heads.py:104-140, :360-492), the camray head
caches window 0's intrinsics solve (dense_heads.py:288-334), and the tracker
carries re-queries/prompts/memory forward (sparse_heads.py:213-495) — so the
same model can run *online*: push frames as they arrive, get final outputs
back with one window-stride of latency.

`StreamingL4P` does exactly that, re-using the offline per-window stage
functions (`encode_windows`, `run_dense_heads_stacked`/`dense_head_raw`, the
geometry solvers, the overlap aligners) and carrying exactly the state the
offline `lax.scan`s carry. Output finality follows the offline stitcher's
"last writer wins" rule (models/l4p.py:_writer_index): frame f is final once
window floor(f/stride) has run, so each new `stride` frames of input yields
`stride` frames of final output for every task. Outputs equal the offline
`l4p_forward` run on the same frames (tests/test_streaming.py); the one
exception is the variable-K camray mode, where the offline path draws its
per-window RANSAC keys with `jax.random.split(key, nw)` — unknowable online —
and streaming uses `fold_in(key, w)` instead (equal in distribution, not
bitwise).

Latency/throughput on one chip: per-window all-task compute is ~215 ms
(ROUND_NOTES round 2), i.e. a sustained 8-frame stride every ~215 ms — real
time for 30 fps video with ~0.5 s end-to-end latency.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from l4p_tpu.geometry.alignment import (
    linear_scale_apply,
    linear_scale_solve,
    lstsq_affine_apply,
    lstsq_affine_solve,
    sim3_overlap_apply,
    sim3_overlap_solve,
)
from l4p_tpu.geometry.cameras import (
    rays_to_cameras,
    rays_to_cameras_and_fixed_intrinsics,
    rays_to_cameras_and_variable_intrinsics,
)
from l4p_tpu.geometry.core import normalize_intrinsics
from l4p_tpu.models.l4p import (
    L4PConfig,
    dense_head_raw,
    encode_windows,
    merge_query_chunks,
    run_dense_heads_stacked,
)
from l4p_tpu.models.track import TrackConfig, track_forward


def assemble_emissions(emits: Sequence[Dict[str, jnp.ndarray]]) -> Dict[str, jnp.ndarray]:
    """Concatenate per-window emissions (+ flush tail) back into full-video
    outputs, shaped exactly like the offline l4p_forward's return."""
    emits = [e for e in emits if e is not None]
    assert emits and [e["t0"] for e in emits] == sorted(e["t0"] for e in emits)
    out = {}
    for k in emits[0]:
        if k == "t0":
            continue
        axis = -1 if k.endswith(("_bn2t", "_bn1t")) else 2
        out[k] = jnp.concatenate([e[k] for e in emits], axis=axis)
    return out


def _pose_from_ext(ext_b44t: jnp.ndarray) -> jnp.ndarray:
    """pose = inv(extrinsics), flattened to (B, 16, t)
    (models/l4p.py:camray_windows_to_cameras, dense_heads.py:346-347)."""
    b = ext_b44t.shape[0]
    pose = jnp.linalg.inv(ext_b44t.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
    return pose.reshape(b, 16, ext_b44t.shape[3])


# ---------------------------------------------------------------------------
# per-window track step with a rolling window-length buffer
# ---------------------------------------------------------------------------

def _track_stream_step(
    params: Dict,
    cfg: TrackConfig,
    carry: Dict[str, jnp.ndarray],
    enc_bpc: jnp.ndarray,  # (B, P, C) this window's final encoder feature
    queries0_bn3: jnp.ndarray,  # ORIGINAL input queries (label-2 comparison)
    w_idx: jnp.ndarray,
    stride: int,
    is_first: bool,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """One window of the causal tracking scan, with rolling `ws`-length output
    buffers instead of the offline T-length ones.

    Mirrors models/track.py:track_forward_windowed's scan body exactly: the
    offline `masked_write` blends new values with the buffer's previous
    content over [start, start+ws); here the buffer always covers exactly
    that span, so "previous content" is the last window's buffer shifted by
    `stride` with fresh init values in the tail. The re-query argmax reads
    the same [next_start, next_start+overlap) span from the rolling tail.
    """
    b, p, c = enc_bpc.shape
    n = carry["queries"].shape[1]
    ws = cfg.image_size[0]
    dtype = carry["queries"].dtype
    mdtype = enc_bpc.dtype

    frame_ids = jnp.arange(ws, dtype=dtype)
    start = (w_idx * stride).astype(dtype)
    cur_q = carry["queries"]

    valid_t = (frame_ids[None, None, :] + start + 0.5 - cur_q[:, :, 0:1]) >= 0
    valid_bn1t = valid_t[:, :, None, :]
    valid_bn = valid_t.sum(-1) > 0

    # reference overwrite order: equals-input sets label 1 even when not yet
    # valid (see models/track.py — only padding queries ever get label 0)
    lab = jnp.where(valid_bn, 1.0, 0.0).astype(dtype)
    if cfg.modify_pointlabels_for_windowing:
        eq_input = ((cur_q == queries0_bn3).sum(-1)) > 0
        lab = jnp.where(eq_input, 1.0, lab)
        lab = jnp.where(jnp.logical_and(valid_bn, ~eq_input), 2.0, lab)

    q_off = cur_q.at[:, :, 0].add(-start)

    if cfg.attend_to_past:
        first = enc_bpc[:, None, : p // 2] + carry["history"]
        second = (enc_bpc[:, p // 2 :] + params["processed_video_mask_token"].astype(mdtype))[
            :, None
        ]
        enc_in = jnp.concatenate(
            [first, jnp.broadcast_to(second, (b, n, p - p // 2, c))], axis=2
        )
    else:
        enc_in = enc_bpc

    out = track_forward(
        params, cfg, enc_in, q_off, lab, carry["prompt_feats"], carry["prompt_labels"]
    )
    tname = cfg.task_name

    def init_buf(key_: str) -> jnp.ndarray:
        shape = carry[key_].shape
        if key_ == "vis":
            return -10.0 * jnp.ones(shape, dtype)
        return jnp.zeros(shape, dtype)

    def rolling_write(key_: str, vals: jnp.ndarray) -> jnp.ndarray:
        if is_first:
            old = init_buf(key_)
        else:
            init_tail = init_buf(key_)[..., :stride]
            old = jnp.concatenate([carry[key_][..., stride:], init_tail], axis=-1)
        return jnp.where(valid_bn1t, vals.astype(dtype), old)

    vis_buf = rolling_write("vis", out[f"{tname}_vis_est_bn1t"])
    traj_buf = rolling_write("traj", out[f"{tname}_traj_est_bn2t"])
    depth_buf = carry["depth"]
    if cfg.estimate_depth:
        depth_buf = rolling_write("depth", out[f"{tname}_depth_est_bn1t"])

    new_pf = carry["prompt_feats"]
    new_pl = carry["prompt_labels"]
    if cfg.prompt_using_features:
        new_pf = jnp.where(valid_bn[..., None], out[f"{tname}_prompt_features_bnc"].astype(mdtype), new_pf)
        new_pl = jnp.where(valid_bn, 1.0, new_pl).astype(dtype)

    new_hist = carry["history"]
    if cfg.attend_to_past:
        new_hist = out[f"{tname}_enc_history_kept_bnpc"].astype(mdtype)

    # re-query at the argmax-visibility frame inside the next overlap — the
    # rolling tail [stride:] is exactly [next_start, next_start+overlap)
    next_start = (w_idx * stride + stride).astype(jnp.int32)
    vis_ov = vis_buf[..., stride:]
    traj_ov = traj_buf[..., stride:]
    best = jnp.argmax(vis_ov[:, :, 0, :], axis=-1)
    best_xy = jnp.take_along_axis(traj_ov, best[:, :, None, None], axis=-1)[..., 0]
    new_t = best.astype(dtype) + next_start.astype(dtype) + 0.5
    cand_q = jnp.concatenate([new_t[..., None], best_xy], axis=-1)
    q_valid = cand_q[..., 0] > cur_q[..., 0]
    new_q = jnp.where(q_valid[..., None], cand_q, cur_q)

    new_carry = {
        "queries": new_q,
        "prompt_feats": new_pf,
        "prompt_labels": new_pl,
        "history": new_hist,
        "traj": traj_buf,
        "vis": vis_buf,
        "depth": depth_buf,
    }
    emit = {"traj": traj_buf[..., :stride], "vis": vis_buf[..., :stride]}
    if cfg.estimate_depth:
        emit["depth"] = depth_buf[..., :stride]
    return new_carry, emit


class StreamingL4P:
    """Push frames in, get final per-frame outputs back, one window at a time.

    Usage::

        s = StreamingL4P(params, cfg, tasks, queries_bn3, labels_bn)
        for chunk in camera:                  # any chunk sizes
            for emit in s.push(chunk, intrinsics):
                ...                           # emit covers `stride` frames
        tail = s.flush()                      # the final window's tail frames

    Constraints (offline parity): forward-only tracking
    (estimation_directions == (1,)), total pushed frames must tile the
    window/stride grid (the offline forward asserts the same,
    models/l4p.py:encode_windows), and tracking queries are declared up
    front (the reference semantics — queries are inputs, not discovered).
    """

    def __init__(
        self,
        params: Dict,
        cfg: L4PConfig,
        tasks: Sequence[str],
        queries_bn3: Optional[jnp.ndarray] = None,
        labels_bn: Optional[jnp.ndarray] = None,
        key: Optional[jax.Array] = None,
    ):
        self.params = params
        self.cfg = cfg
        self.tasks = tuple(tasks)
        self.key = jax.random.PRNGKey(0) if key is None else key
        heads = cfg.head_dict
        for t in self.tasks:
            if t != "track_2d" and heads[t].kind == "camera_rays":
                raise NotImplementedError("camera_rays head has no streaming stitcher")
        if "track_2d" in self.tasks and tuple(cfg.track.estimation_directions) != (1,):
            raise ValueError("streaming tracking is forward-only (causality)")
        if cfg.encoder.cam_emb_placed_at is not None:
            raise NotImplementedError(
                "streaming does not plumb extrinsics for the Plucker camera "
                "embedding; use the offline l4p_forward for cam_emb configs"
            )

        self.ws, self.stride = cfg.window_size[0], cfg.window_stride_t
        self.h, self.w = cfg.window_size[1:]
        self.joint = (
            cfg.joint_alignment and "depth" in self.tasks and "camray" in self.tasks
        )

        # host-side frame buffer (list of pushed chunks, trimmed as windows
        # complete); _buf_t counts ALL frames ever pushed (absolute index)
        self._frames: List[np.ndarray] = []  # each (B, chunk_t, H, W, 3) uint8
        self._intr: List[Optional[np.ndarray]] = []
        self._buf_t = 0
        self._w = 0  # next window index
        self._flushed = False
        # intrinsics must come with every push or never — a mid-stream flip
        # would silently change the camray K source (fixed mode rotations
        # come from the INPUT K when given); tracked as session state, not
        # recomputed from the trimmed buffer
        self._has_intr: Optional[bool] = None

        self._track_chunks = None
        if "track_2d" in self.tasks:
            if queries_bn3 is None:
                raise ValueError("track_2d requires queries at session start")
            # labels_bn is accepted for API symmetry with run_track_chunked
            # but — like the offline windowed scan (track_forward_windowed) —
            # per-window labels are recomputed from query validity, so only
            # the queries persist
            del labels_bn
            q = jnp.asarray(queries_bn3)
            tc = cfg.track
            n = q.shape[1]
            chunk = min(tc.max_queries, n)
            n_chunks = -(-n // chunk)
            pad = n_chunks * chunk - n
            if pad:
                # padded queries get label 0 downstream (invalid), outputs
                # are sliced off in merge() — same as run_track_chunked
                q = jnp.concatenate([q, jnp.zeros((q.shape[0], pad, 3), q.dtype)], 1)
            b = q.shape[0]
            self._n_queries = n
            self._q0 = q.reshape(b, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
            self._track_chunks = (n_chunks, chunk)

        self._carry = None  # built lazily on the first window (needs dtypes)
        self._step_jit = jax.jit(
            functools.partial(self._step_impl), static_argnames=("is_first",)
        )

    # -- carry construction ------------------------------------------------

    def _init_carry(self, b: int) -> Dict:
        cfg = self.cfg
        ws, h, w = self.ws, self.h, self.w
        mdtype = self.params["video_encoder"]["patch_embed"]["weight"].dtype
        carry: Dict = {}
        if "flow_2d_backward" in self.tasks:
            carry["flow_prev"] = jnp.zeros((b, 2, ws, h, w), jnp.float32)
        if "dyn_mask" in self.tasks:
            carry["dyn_prev"] = jnp.zeros((b, 1, ws, h, w), jnp.float32)
        if "depth" in self.tasks:
            carry["depth_prev"] = jnp.zeros((b, 1, ws, h, w), jnp.float32)
        if "camray" in self.tasks:
            carry["pose_prev"] = jnp.zeros((b, 16, ws), jnp.float32)
            carry["intr_prev"] = jnp.zeros((b, 16, ws), jnp.float32)
            carry["k0_img"] = jnp.zeros((b, 4, 4, ws), jnp.float32)
        if self._track_chunks is not None:
            tc = cfg.track
            n_chunks, chunk = self._track_chunks
            p = tc.sam.num_video_tokens
            c = tc.sam.embed_dim
            if tc.attend_to_past:
                hist0 = jnp.broadcast_to(
                    self.params["task_heads"]["track_2d"][
                        "processed_video_mask_token"
                    ].astype(mdtype)[None, None, None, None, :],
                    (n_chunks, b, chunk, p // 2, c),
                )
            else:
                hist0 = jnp.zeros((n_chunks, 1), mdtype)
            dtype = self._q0.dtype
            carry["track"] = {
                "queries": self._q0,
                "prompt_feats": jnp.zeros((n_chunks, b, chunk, c), mdtype),
                "prompt_labels": jnp.zeros((n_chunks, b, chunk), dtype),
                "history": hist0,
                "traj": jnp.zeros((n_chunks, b, chunk, 2, ws), dtype),
                "vis": -10.0 * jnp.ones((n_chunks, b, chunk, 1, ws), dtype),
                "depth": jnp.zeros((n_chunks, b, chunk, 1, ws), dtype),
            }
        return carry

    # -- the traced per-window step -----------------------------------------

    def _step_impl(
        self,
        params: Dict,
        carry: Dict,
        rgb_u8: Optional[jnp.ndarray],
        rgb_f: Optional[jnp.ndarray],
        intr_win: Optional[jnp.ndarray],
        w_idx: jnp.ndarray,
        is_first: bool,
    ) -> Tuple[Dict, Dict]:
        cfg, tasks = self.cfg, self.tasks
        heads = cfg.head_dict
        ws, stride = self.ws, self.stride
        img_info = (ws, self.h, self.w)
        s = stride
        key = self.key

        enc = encode_windows(
            params["video_encoder"], cfg, rgb_f, intr_win, None, rgb_u8_bthw3=rgb_u8
        )

        dense: Dict[str, jnp.ndarray] = dict(
            run_dense_heads_stacked(params["task_heads"], cfg, enc["hooks"], tasks, img_info)
        )
        for t in tasks:
            if t == "track_2d" or t in dense:
                continue
            hcfg = heads[t]
            feats = [enc["hooks"][h_][0] for h_ in hcfg.dpt.hooks]
            dense[t] = dense_head_raw(params["task_heads"][t], hcfg, feats, img_info)[None]
        dense = {t: v[0] for t, v in dense.items()}  # squeeze the nw=1 axis

        new_carry = dict(carry)
        emit: Dict[str, jnp.ndarray] = {}

        # ---- camray: per-window rays -> pose (+K), window-0 solve carried
        # (models/l4p.py:camray_windows_to_cameras, one window at a time)
        if "camray" in tasks:
            hcfg = heads["camray"]
            rays = dense["camray"].astype(jnp.float32)
            b = rays.shape[0]
            if hcfg.use_intrinsics:
                kn = normalize_intrinsics(intr_win.astype(jnp.float32), self.h, self.w)
                ext, _ = rays_to_cameras(rays, kn)
                k_out = intr_win.astype(jnp.float32).reshape(b, 16, ws)
            elif hcfg.fixed_intrinsics:
                if is_first:
                    ext, _, k0 = rays_to_cameras_and_fixed_intrinsics(
                        rays, jax.random.fold_in(key, 7), output_size=(self.h, self.w)
                    )
                    new_carry["k0_img"] = k0
                else:
                    k0 = carry["k0_img"]
                    if intr_win is not None:
                        kn = normalize_intrinsics(
                            intr_win.astype(jnp.float32), self.h, self.w
                        )
                    else:
                        kn = normalize_intrinsics(k0, self.h, self.w)
                    ext, _ = rays_to_cameras(rays, kn)
                k_out = (new_carry["k0_img"] if is_first else k0).reshape(b, 16, ws)
            else:
                # offline draws per-window keys with split(key7, nw), which
                # needs nw up front; online uses fold_in(key7, w) — identical
                # solver, different RANSAC draws (equal in distribution)
                ext, _, k_var = rays_to_cameras_and_variable_intrinsics(
                    rays,
                    jax.random.fold_in(jax.random.fold_in(key, 7), w_idx),
                    output_size=(self.h, self.w),
                )
                k_out = k_var.reshape(b, 16, ws)
            pose = _pose_from_ext(ext)
        else:
            pose = k_out = None

        # ---- alignment chains (the offline scan bodies, one step) ----
        if self.joint:
            cur_d = dense["depth"].astype(jnp.float32)
            b = cur_d.shape[0]
            overlap = ws - stride
            if is_first:
                aligned_d, aligned_p = cur_d, pose
            else:
                pred = {
                    "depth": cur_d[:, :, :overlap],
                    "camray": pose[:, :, :overlap],
                    "camray_intrinsics": k_out[:, :, :overlap].reshape(b, 4, 4, overlap),
                }
                tgt = {
                    "depth": carry["depth_prev"][:, :, stride:],
                    "camray": carry["pose_prev"][:, :, stride:],
                    "camray_intrinsics": carry["intr_prev"][:, :, stride:].reshape(
                        b, 4, 4, overlap
                    ),
                }
                rel = sim3_overlap_solve(
                    pred,
                    tgt,
                    jax.random.fold_in(jax.random.fold_in(key, 11), w_idx),
                    min_samples=cfg.sim3_min_samples,
                    num_trials=cfg.sim3_num_trials,
                )
                applied = sim3_overlap_apply(
                    rel, {"depth": cur_d, "camray": pose, "camray_intrinsics": k_out}
                )
                aligned_d, aligned_p = applied["depth"], applied["camray"]
            new_carry["depth_prev"] = aligned_d
            new_carry["pose_prev"] = aligned_p
            new_carry["intr_prev"] = k_out
            emit["depth_est_b1thw"] = aligned_d[:, :, :s]
            hname = heads["camray"].task_name
            emit[f"{hname}_est_b16t"] = aligned_p[:, :, :s]
            emit[f"{hname}_intrinsics_est_b16t"] = k_out[:, :, :s]
        else:
            if "depth" in tasks:
                hd = heads["depth"]
                cur = dense["depth"].astype(jnp.float32)
                if is_first:
                    aligned = cur
                else:
                    prev = carry["depth_prev"]
                    overlap = ws - stride
                    if hd.align_type == "affine":
                        sol = lstsq_affine_solve(
                            cur[:, :, :overlap], prev[:, :, stride:], pre_inverse=hd.align_pre_inverse
                        )
                        aligned = lstsq_affine_apply(sol, cur, pre_inverse=hd.align_pre_inverse)
                    else:
                        sol = linear_scale_solve(
                            cur[:, :, :overlap], prev[:, :, stride:], pre_inverse=hd.align_pre_inverse
                        )
                        aligned = linear_scale_apply(sol, cur, pre_inverse=hd.align_pre_inverse)
                new_carry["depth_prev"] = aligned
                emit["depth_est_b1thw"] = aligned[:, :, :s]
            if "camray" in tasks:
                hname = heads["camray"].task_name
                new_carry["pose_prev"] = pose
                new_carry["intr_prev"] = k_out
                emit[f"{hname}_est_b16t"] = pose[:, :, :s]
                if not heads["camray"].use_intrinsics:
                    emit[f"{hname}_intrinsics_est_b16t"] = k_out[:, :, :s]

        if "dyn_mask" in tasks:
            cur = dense["dyn_mask"].astype(jnp.float32)
            new_carry["dyn_prev"] = cur
            emit["dyn_mask_est_b1thw"] = cur[:, :, :s]

        if "flow_2d_backward" in tasks:
            cur = dense["flow_2d_backward"].astype(jnp.float32)
            if is_first:
                # frame 0 is window 0's local frame 0 (the flow-skip rule
                # only bites from window 1 on, models/l4p.py:_writer_index)
                chunk_out = cur[:, :, :s]
            else:
                # frame w*s comes from the PREVIOUS window's local frame s
                chunk_out = jnp.concatenate(
                    [carry["flow_prev"][:, :, s : s + 1], cur[:, :, 1:s]], axis=2
                )
            new_carry["flow_prev"] = cur
            emit["flow_2d_backward_est_b2thw"] = chunk_out

        if self._track_chunks is not None:
            tcfg = cfg.track
            tname = tcfg.task_name

            def one_chunk(tc_carry, q0):
                return _track_stream_step(
                    params["task_heads"]["track_2d"], tcfg, tc_carry,
                    enc["final"][0], q0, w_idx, stride, is_first,
                )

            new_track, t_emit = jax.vmap(one_chunk)(carry["track"], self._q0)
            new_carry["track"] = new_track

            emit[f"{tname}_traj_est_bn2t"] = merge_query_chunks(t_emit["traj"], self._n_queries)
            emit[f"{tname}_vis_est_bn1t"] = merge_query_chunks(t_emit["vis"], self._n_queries)
            if tcfg.estimate_depth:
                emit[f"{tname}_depth_est_bn1t"] = merge_query_chunks(
                    t_emit["depth"], self._n_queries
                )

        return new_carry, emit

    # -- host-side frame plumbing -------------------------------------------

    def push(
        self,
        rgb_u8_bthw3: np.ndarray,
        intrinsics_b44t: Optional[np.ndarray] = None,
    ) -> List[Dict[str, jnp.ndarray]]:
        """Append frames; run every window that becomes complete. Returns one
        emission dict per completed window, each covering `stride` final
        frames starting at emission['t0'].

        The host-side frame buffer is bounded: every complete window is run
        and consumed inside this call (`_run_next_window` -> `_trim`), so at
        return the buffer holds at most `window + stride - 1` frames plus the
        tail of the current push chunk — it cannot grow with stream length.
        """
        if self._flushed:
            raise RuntimeError("session already flushed")
        rgb = np.asarray(rgb_u8_bthw3)
        # hard exceptions, not asserts: this is the public serving surface
        # and must validate under `python -O` too (docs/serving.md)
        if rgb.dtype != np.uint8:
            raise TypeError(f"push expects uint8 frames, got {rgb.dtype}")
        if rgb.ndim != 5 or rgb.shape[-1] != 3:
            raise ValueError(f"push expects (B,t,H,W,3), got shape {rgb.shape}")
        if self._frames:
            prev = self._frames[0]
            if rgb.shape[0] != prev.shape[0] or rgb.shape[2:] != prev.shape[2:]:
                raise ValueError(
                    f"push shape {rgb.shape} disagrees with earlier frames "
                    f"{prev.shape} on (B, H, W, C)"
                )
        if self._has_intr is None:
            self._has_intr = intrinsics_b44t is not None
        elif self._has_intr != (intrinsics_b44t is not None):
            raise ValueError("intrinsics must come with every push or never")
        self._frames.append(rgb)
        self._intr.append(
            None if intrinsics_b44t is None else np.asarray(intrinsics_b44t)
        )
        self._buf_t += rgb.shape[1]

        emissions = []
        while self._buf_t >= self._w * self.stride + self.ws:
            emissions.append(self._run_next_window())
        return emissions

    def _window_slice(self, start: int, length: int):
        """Assemble frames [start, start+length) from the chunk list."""
        rgb_parts, intr_parts = [], []
        off = self._frame0_abs()
        for rgb, intr in zip(self._frames, self._intr):
            t = rgb.shape[1]
            lo, hi = max(start - off, 0), min(start + length - off, t)
            if lo < hi:
                rgb_parts.append(rgb[:, lo:hi])
                if self._has_intr:
                    intr_parts.append(intr[:, :, :, lo:hi])
            off += t
        rgb_w = np.concatenate(rgb_parts, axis=1)
        intr_w = np.concatenate(intr_parts, axis=3) if intr_parts else None
        return rgb_w, intr_w

    def _frame0_abs(self) -> int:
        return self._buf_t - sum(r.shape[1] for r in self._frames)

    def _trim(self):
        """Drop buffered frames before the next window's start."""
        start = self._w * self.stride
        while self._frames and self._frame0_abs() + self._frames[0].shape[1] <= start:
            self._frames.pop(0)
            self._intr.pop(0)

    def _run_next_window(self) -> Dict[str, jnp.ndarray]:
        start = self._w * self.stride
        rgb_w, intr_w = self._window_slice(start, self.ws)
        if self._carry is None:
            self._carry = self._init_carry(rgb_w.shape[0])
        is_first = self._w == 0
        self._carry, emit = self._step_jit(
            self.params,
            self._carry,
            jnp.asarray(rgb_w),
            None,
            None if intr_w is None else jnp.asarray(intr_w),
            jnp.asarray(self._w, jnp.int32),
            is_first=is_first,
        )
        emit = dict(emit)
        emit["t0"] = start
        self._w += 1
        self._trim()
        return emit

    def warmup(self, batch_size: int = 1, with_intrinsics: bool = True) -> None:
        """Compile both jit variants (first-window and steady-state) on dummy
        frames before accepting traffic, then reset the session. The variants
        are shape- and signature-specialized: warm with the SAME batch size
        and the same with/without-intrinsics choice production will use."""
        state = self.get_state()
        try:
            ws, stride = self.ws, self.stride
            rgb = np.zeros((batch_size, ws + stride, self.h, self.w, 3), np.uint8)
            intr = None
            if with_intrinsics:
                intr = np.broadcast_to(
                    np.eye(4, dtype=np.float32)[None, :, :, None],
                    (batch_size, 4, 4, ws + stride),
                ).copy()
            self.push(rgb, intr)  # completes window 0 AND one steady window
        finally:
            self.set_state(state)

    # -- checkpoint / resume (failure recovery for long-running streams) ----

    def get_state(self) -> Dict:
        """Snapshot the session: model carries + host-side frame buffer.
        Everything is numpy/python, so it serializes with np.savez / orbax —
        a crashed streaming worker resumes exactly where it stopped
        (tests/test_streaming.py::test_streaming_checkpoint_resume)."""
        carry_np = (
            None
            if self._carry is None
            else jax.tree.map(lambda x: np.asarray(x), self._carry)
        )
        return {
            "carry": carry_np,
            "w": self._w,
            "buf_t": self._buf_t,
            "frames": [f.copy() for f in self._frames],
            "intr": [None if i is None else i.copy() for i in self._intr],
            "flushed": self._flushed,
            "has_intr": self._has_intr,
            # the PRNG key seeds the Sim(3)/camray RANSAC folds — a resume
            # under a different key would silently diverge from the
            # uninterrupted stream, so the snapshot pins it
            "key": np.asarray(self.key),
        }

    def set_state(self, state: Dict) -> None:
        """Restore a get_state() snapshot (params/cfg/tasks/queries must match
        the ones the session was constructed with; the PRNG key is verified)."""
        if not np.array_equal(np.asarray(self.key), state["key"]):
            raise ValueError(
                "snapshot was taken under a different PRNG key — construct "
                "the session with the same key to resume bit-identically"
            )
        self._carry = (
            None
            if state["carry"] is None
            else jax.tree.map(jnp.asarray, state["carry"])
        )
        self._w = state["w"]
        self._buf_t = state["buf_t"]
        self._frames = [f.copy() for f in state["frames"]]
        self._intr = [None if i is None else i.copy() for i in state["intr"]]
        self._flushed = state["flushed"]
        self._has_intr = state["has_intr"]

    def flush(self) -> Optional[Dict[str, jnp.ndarray]]:
        """Emit the final window's tail (`ws - stride` frames). Raises if
        leftover frames never completed a window — the same tiling contract
        the offline forward asserts (models/l4p.py:encode_windows)."""
        if self._flushed:
            return None
        if self._w == 0:
            raise ValueError(f"no window completed ({self._buf_t} frames < {self.ws})")
        leftover = self._buf_t - ((self._w - 1) * self.stride + self.ws)
        if leftover:
            # raise BEFORE marking flushed: the caller can push padding
            # frames (as the error says) and flush again
            raise ValueError(
                f"{leftover} trailing frames do not tile the window grid "
                f"(window {self.ws} / stride {self.stride}); pad the stream"
            )
        self._flushed = True
        s = self.stride
        carry = self._carry
        heads = self.cfg.head_dict
        emit: Dict[str, jnp.ndarray] = {"t0": (self._w - 1) * s + s}
        if "depth" in self.tasks:
            emit["depth_est_b1thw"] = carry["depth_prev"][:, :, s:]
        if "camray" in self.tasks:
            hname = heads["camray"].task_name
            emit[f"{hname}_est_b16t"] = carry["pose_prev"][:, :, s:]
            if self.joint or not heads["camray"].use_intrinsics:
                emit[f"{hname}_intrinsics_est_b16t"] = carry["intr_prev"][:, :, s:]
        if "dyn_mask" in self.tasks:
            emit["dyn_mask_est_b1thw"] = carry["dyn_prev"][:, :, s:]
        if "flow_2d_backward" in self.tasks:
            emit["flow_2d_backward_est_b2thw"] = carry["flow_prev"][:, :, s:]
        if self._track_chunks is not None:
            tname = self.cfg.track.task_name
            n = self._n_queries
            emit[f"{tname}_traj_est_bn2t"] = merge_query_chunks(carry["track"]["traj"][..., s:], n)
            emit[f"{tname}_vis_est_bn1t"] = merge_query_chunks(carry["track"]["vis"][..., s:], n)
            if self.cfg.track.estimate_depth:
                emit[f"{tname}_depth_est_bn1t"] = merge_query_chunks(
                    carry["track"]["depth"][..., s:], n
                )
        return emit
