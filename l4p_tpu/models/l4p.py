"""L4P orchestrator: shared encoder + per-task heads + sliding-window
stitching.

Re-designs the reference L4P_VideoMAE.forward (reference:
l4p/models/l4p_videomae.py:125-330, dense_heads.py:76-143 and :360-492) the
TPU way:

  * all windows are encoded in one batched call (`lax.map` over window
    chunks) — the reference's per-window Python loop
    (l4p_videomae.py:278-293) disappears;
  * per-task stitching: flow/dyn_mask are pure gathers ("last writer wins"
    with the flow frame-0 skip); depth and joint depth+camray are
    `lax.scan`s whose carry is the previous aligned window — no T-length
    mutable buffer;
  * the camray stateful fixed-intrinsics cache
    (dense_heads.py:288, :303-334) becomes an explicit window-0 solve whose
    K is broadcast to later windows;
  * everything is jittable end-to-end with static window counts.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from l4p_tpu.models.encoder import EncoderConfig, GIANT, encoder_apply
from l4p_tpu.models.dpt import DPTConfig, dpt_apply
from l4p_tpu.models.track import TrackConfig, track_forward, track_forward_windowed
from l4p_tpu.ops.misc import apply_fn
from l4p_tpu.geometry.core import normalize_intrinsics
from l4p_tpu.geometry.cameras import (
    rays_to_cameras,
    rays_to_cameras_and_fixed_intrinsics,
    rays_to_cameras_and_variable_intrinsics,
)
from l4p_tpu.geometry.alignment import (
    lstsq_affine_solve,
    lstsq_affine_apply,
    linear_scale_solve,
    linear_scale_apply,
    sim3_overlap_solve,
    sim3_overlap_apply,
)


@dataclasses.dataclass(frozen=True)
class DenseHeadConfig:
    task_name: str  # output key stem ('flow_2d_backward', 'depth', 'dyn_mask', 'traj3d')
    kind: str  # 'flow' | 'depth' | 'dyn_mask' | 'camray'
    out_nchan: int
    dpt: DPTConfig
    depth_fn: str = "exp"  # depth head activation (configs/model.yaml:36)
    mask_fn: str = "linear"  # dyn_mask activation (configs/model.yaml:51)
    align_pre_inverse: bool = True  # depth aligned in disparity (model.yaml:38)
    align_type: str = "affine"  # 'affine' | 'linear'
    use_intrinsics: bool = False  # camray modes (model.yaml:44-45)
    fixed_intrinsics: bool = True

    @property
    def task_suffix(self) -> str:
        return "b16t" if self.kind == "camray" else f"b{self.out_nchan}thw"


def default_dense_heads(hooks: Tuple[int, ...] = (14, 21, 28, 36)) -> Dict[str, DenseHeadConfig]:
    """The released configs/model.yaml head set."""
    return {
        "flow_2d_backward": DenseHeadConfig(
            task_name="flow_2d_backward", kind="flow", out_nchan=2,
            dpt=DPTConfig(num_channels=2, hooks=hooks),
        ),
        "depth": DenseHeadConfig(
            task_name="depth", kind="depth", out_nchan=1,
            dpt=DPTConfig(num_channels=1, hooks=hooks),
        ),
        "dyn_mask": DenseHeadConfig(
            task_name="dyn_mask", kind="dyn_mask", out_nchan=1,
            dpt=DPTConfig(num_channels=1, hooks=hooks),
        ),
        "camray": DenseHeadConfig(
            task_name="traj3d", kind="camray", out_nchan=6,
            dpt=DPTConfig(
                num_channels=6, hooks=hooks,
                actpost_scale_factors=((1, 0, 0), (1, 0, 0), (0, 0, 0), (-1, -1, -1)),
                fusion_scale_factors=((1, 1, 1), (1, 1, 1), (2, 1, 1), (2, 2, 2)),
                output_size=(16, 16, 16),
            ),
        ),
    }


@dataclasses.dataclass(frozen=True)
class L4PConfig:
    encoder: EncoderConfig = GIANT
    window_size: Tuple[int, int, int] = (16, 224, 224)
    window_stride_t: int = 8
    joint_alignment: bool = True
    heads: Tuple[Tuple[str, DenseHeadConfig], ...] = tuple(default_dense_heads().items())
    track: TrackConfig = dataclasses.field(default_factory=TrackConfig)
    enc_window_chunk: int = 2  # windows encoded per lax.map step
    dense_window_chunk: int = 2
    sim3_num_trials: int = 128  # RANSAC hypotheses for joint alignment
    sim3_min_samples: int = 10
    # training-time freeze controls (reference l4p_videomae.py:199-218):
    # freeze the whole encoder, optionally re-enabling `unfreeze_blocks`
    # (plus the final norm) and/or freezing whole task heads. Enforced by
    # l4p_tpu.train.trainable_mask / make_optimizer, not by the forward.
    freeze_video_encoder: bool = False
    unfreeze_blocks: Optional[Tuple[int, ...]] = None
    freeze_heads: Tuple[str, ...] = ()
    # optional encoder-only init checkpoint, loaded strict=False-style
    # (reference l4p_videomae.py:187-191)
    video_encoder_ckpt_path: Optional[str] = None

    @property
    def head_dict(self) -> Dict[str, DenseHeadConfig]:
        return dict(self.heads)

    @property
    def all_hooks(self) -> Tuple[int, ...]:
        hooks: List[int] = []
        for _, h in self.heads:
            for idx in h.dpt.hooks:
                if idx not in hooks:
                    hooks.append(idx)
        return tuple(sorted(hooks))


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------

def _map_batch(nw: int, pref: int) -> int:
    """Largest lax.map batch_size <= pref that DIVIDES nw (window-chunk sizes
    measured within 2% runtime of each other on the chip, ROUND_NOTES r3)."""
    from l4p_tpu.ops.misc import largest_divisor_leq

    return largest_divisor_leq(nw, pref)


def encode_windows(
    enc_params: Dict,
    cfg: L4PConfig,
    rgb_b3thw: Optional[jnp.ndarray],
    intrinsics_b44t: Optional[jnp.ndarray] = None,
    extrinsics_b44t: Optional[jnp.ndarray] = None,
    mesh=None,
    rgb_u8_bthw3: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Slice the video into overlapping windows and encode them all.

    Returns {'hooks': [(nw, B, P, C) per hook], 'final': (nw, B, P, C)}.
    Replaces the reference per-window loop (l4p_videomae.py:278-293).

    With `rgb_u8_bthw3`, the host ships raw uint8 (4x less transfer than
    normalized fp32, replacing the reference's host-side normalize at
    l4p_dataset_mini.py:576-580): the whole video is tokenized ONCE by the
    fused normalize+patchify matmul (models/ingest.py) and windows are
    sliced in token space — which also removes the 2x patchify recompute of
    the 8-frame window overlaps.

    With `mesh`, the window axis is sharded over the mesh's 'data' axis —
    the embarrassingly parallel multi-chip inference path (windows have no
    cross-dependence until stitching).
    """
    if rgb_u8_bthw3 is not None:
        b, t, h, w = rgb_u8_bthw3.shape[:4]
    else:
        b, _, t, h, w = rgb_b3thw.shape
    ws, stride = cfg.window_size[0], cfg.window_stride_t
    # windows must tile the video exactly — otherwise tail frames would be
    # silently filled by clamped gathers in the stitcher (stronger than the
    # reference's T % stride check, l4p_videomae.py:267-269, which zero-fills
    # the tail)
    assert t >= ws and (t - ws) % stride == 0, (
        f"T={t} not tiled by window {ws} / stride {stride}"
    )
    nw = (t - ws) // stride + 1
    starts = jnp.arange(nw) * stride

    hooks = cfg.all_hooks
    use_cam = cfg.encoder.cam_emb_placed_at is not None

    if rgb_u8_bthw3 is not None:
        from l4p_tpu.models.ingest import ingest_video_tokens

        ecfg = cfg.encoder
        tt = ecfg.tubelet_size
        assert stride % tt == 0, "window stride must be a tubelet multiple for token slicing"
        cdtype = enc_params["patch_embed"]["weight"].dtype
        tok = ingest_video_tokens(
            enc_params, rgb_u8_bthw3, ecfg, compute_dtype=cdtype, add_pos_embed=False
        )  # (B, (T/tt)*gh*gw, E), token order (t2, h, w)
        gh, gw = h // ecfg.patch_size, w // ecfg.patch_size
        tok = tok.reshape(b, t // tt, gh * gw, ecfg.embed_dim)
        tok_windows = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(tok, s, ws // tt, axis=1)
        )(starts // tt)  # (nw, B, ws/tt, gh*gw, E)
        tok_windows = tok_windows.reshape(nw, b, (ws // tt) * gh * gw, ecfg.embed_dim)
        windows = tok_windows
    else:
        windows = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(rgb_b3thw, s, ws, axis=2)
        )(starts)  # (nw, B, 3, ws, H, W)

    if use_cam:
        # encoder expects normalized intrinsics (l4p_videomae.py:225-232)
        k_norm = normalize_intrinsics(intrinsics_b44t.astype(jnp.float32), h, w)
        k_w = jax.vmap(lambda s: jax.lax.dynamic_slice_in_dim(k_norm, s, ws, axis=3))(starts)
        e_w = jax.vmap(lambda s: jax.lax.dynamic_slice_in_dim(extrinsics_b44t, s, ws, axis=3))(starts)
        inputs = (windows, k_w, e_w)
    else:
        inputs = (windows,)

    is_tokens = rgb_u8_bthw3 is not None

    def enc_one(xs, enc_mesh=None):
        xw = xs[0]
        kw = xs[1] if use_cam else None
        ew = xs[2] if use_cam else None
        out = encoder_apply(
            enc_params, None if is_tokens else xw, cfg.encoder, hooks=hooks, want_final=True,
            intrinsics_b44t=kw, extrinsics_b44t=ew,
            tokens_bne=xw if is_tokens else None,
            mesh=enc_mesh,
        )
        return {"hooks": out["hooks"], "final": out["final"]}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # Merge the window axis into batch — every encoder op is
        # batch-independent, so (nw, B, ...) -> (nw*B, ...) is exact, GSPMD
        # shards the merged axis over 'data' exactly like the old
        # window-vmap did, and (unlike under a vmap) the flash kernel's
        # shard_map sees the true global shapes (encoder.py:_attention).
        spec = NamedSharding(mesh, P("data"))
        merged = tuple(
            jax.lax.with_sharding_constraint(
                x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]), spec
            )
            for x in inputs
        )
        out = enc_one(merged, enc_mesh=mesh)
        res = jax.tree_util.tree_map(
            lambda y: y.reshape((nw, b) + y.shape[1:]), out
        )
    else:
        from l4p_tpu.models.encoder import fused_encoder_engaged

        ecfg = cfg.encoder
        if is_tokens:
            n_tok = windows.shape[2]
        else:
            n_tok = (ws // ecfg.tubelet_size) * (h // ecfg.patch_size) * (w // ecfg.patch_size)
        cdtype = enc_params["patch_embed"]["weight"].dtype
        if ecfg.fused_encoder and fused_encoder_engaged(ecfg, enc_params, n_tok, cdtype):
            # whole-encoder megakernel: merge the window axis into batch and
            # encode the ENTIRE video in one kernel launch — its grid
            # iterates (windows, depth, phases), so no lax.map chunking
            merged = tuple(
                x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]) for x in inputs
            )
            out = enc_one(merged)
            res = jax.tree_util.tree_map(
                lambda y: y.reshape((nw, b) + y.shape[1:]), out
            )
        else:
            res = jax.lax.map(enc_one, inputs, batch_size=_map_batch(nw, cfg.enc_window_chunk))
    return {"hooks": {h: f for h, f in zip(hooks, res["hooks"])}, "final": res["final"]}


# ---------------------------------------------------------------------------
# dense heads (single window, batched over windows by callers)
# ---------------------------------------------------------------------------

def dense_head_raw(
    head_params: Dict, hcfg: DenseHeadConfig, hook_feats: Sequence[jnp.ndarray],
    img_info: Tuple[int, int, int],
) -> jnp.ndarray:
    """DPT trunk + per-kind activation on the raw channels
    (reference dense_heads.py:66-74, :172-182, :208-217)."""
    out = dpt_apply(head_params, hook_feats, hcfg.dpt, img_info)
    out = out[:, : hcfg.out_nchan]
    if hcfg.kind == "depth":
        out = apply_fn(out, hcfg.depth_fn)
    elif hcfg.kind == "dyn_mask":
        out = out.at[:, 0].set(apply_fn(out[:, 0], hcfg.mask_fn))
    return out


def camray_windows_to_cameras(
    rays_w_b6thw: jnp.ndarray,  # (nw, B, 6, t, h, w) fp32
    hcfg: DenseHeadConfig,
    img_info: Tuple[int, int, int],
    intrinsics_b44t: Optional[jnp.ndarray],
    window_stride: int,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-window rays -> (pose (nw,B,16,t), intrinsics_est (nw,B,16,t)).

    Mirrors VideoMAETraj3DDPTHead.forward's three modes
    (dense_heads.py:292-352) with the stateful first-window K cache made
    explicit: window 0 estimates K via on-device homography RANSAC; later
    windows compute rotations from the *input* intrinsics (the reference
    does exactly this, dense_heads.py:329-334) while reporting window 0's K.
    """
    nw, b = rays_w_b6thw.shape[:2]
    t_img, h_img, w_img = img_info
    rays = rays_w_b6thw.astype(jnp.float32)
    tw = rays.shape[3]

    def window_K(w):
        """Input intrinsics sliced for window w, normalized to ray space."""
        k = jax.lax.dynamic_slice_in_dim(intrinsics_b44t, w * window_stride, tw, axis=3)
        return normalize_intrinsics(k.astype(jnp.float32), h_img, w_img)

    if hcfg.use_intrinsics:
        ks = jax.vmap(window_K)(jnp.arange(nw))
        ext, _ = jax.vmap(rays_to_cameras)(rays, ks)
        # the reference emits no estimated K in this mode; the joint path
        # falls back to the RAW input intrinsics (dense_heads.py:424-426)
        k_raw = jax.vmap(
            lambda w: jax.lax.dynamic_slice_in_dim(
                intrinsics_b44t.astype(jnp.float32), w * window_stride, tw, axis=3
            )
        )(jnp.arange(nw))
        k_out = k_raw.reshape(nw, b, 16, tw)
    elif hcfg.fixed_intrinsics:
        ext0, _, k_est0 = rays_to_cameras_and_fixed_intrinsics(
            rays[0], key, output_size=(h_img, w_img)
        )  # K in image-pixel space (B,4,4,tw)
        if nw > 1:
            if intrinsics_b44t is not None:
                # windows >0 compute rotations from the INPUT intrinsics —
                # the reference does exactly this (dense_heads.py:329-334)
                ks = jax.vmap(window_K)(jnp.arange(nw))
            else:
                # no input K (the reference would crash here; we fall back
                # to the window-0 estimate, normalized to ray space)
                k0n = normalize_intrinsics(k_est0, h_img, w_img)
                ks = jnp.broadcast_to(k0n[None], (nw,) + k0n.shape)
            ext_all, _ = jax.vmap(rays_to_cameras)(rays, ks)
            ext = ext_all.at[0].set(ext0)
        else:
            ext = ext0[None]
        k_out = jnp.broadcast_to(k_est0.reshape(1, b, 16, tw), (nw, b, 16, tw))
    else:
        keys = jax.random.split(key, nw)
        ext, _, k_var = jax.vmap(
            lambda r, k: rays_to_cameras_and_variable_intrinsics(r, k, output_size=(h_img, w_img))
        )(rays, keys)
        k_out = k_var.reshape(nw, b, 16, tw)

    # pose = inv(extrinsics) (dense_heads.py:346-347)
    pose = jnp.linalg.inv(ext.transpose(0, 1, 4, 2, 3)).transpose(0, 1, 3, 4, 2)
    pose = pose.reshape(nw, b, 16, tw)
    return pose, k_out


# ---------------------------------------------------------------------------
# stitching
# ---------------------------------------------------------------------------

def _writer_index(t_total: int, nw: int, stride: int, flow_skip: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each output frame, (window index, frame-in-window index) of the
    last window that writes it — the reference's sequential buffer overwrite
    (dense_heads.py:136-140) expressed as a gather."""
    t_idx = jnp.arange(t_total)
    if flow_skip:
        # window w>0 does not write its frame 0 (dense_heads.py:136-138)
        win = jnp.clip(jnp.where(t_idx == 0, 0, (t_idx - 1) // stride), 0, nw - 1)
    else:
        win = jnp.clip(t_idx // stride, 0, nw - 1)
    frame = t_idx - win * stride
    return win, frame


def stitch_overwrite(win_outs: jnp.ndarray, stride: int, t_total: int, flow_skip: bool = False) -> jnp.ndarray:
    """win_outs: (nw, B, C, ws, ...) -> (B, C, T, ...)."""
    nw = win_outs.shape[0]
    win, frame = _writer_index(t_total, nw, stride, flow_skip)
    gathered = win_outs[win, :, :, frame]  # (T, B, C, ...)
    return jnp.moveaxis(gathered, 0, 2)


def stitch_depth_aligned(
    depth_w: jnp.ndarray, stride: int, t_total: int, hcfg: DenseHeadConfig
) -> jnp.ndarray:
    """Sequential scale/shift alignment chain over windows
    (dense_heads.py:104-140 with LstSqAffineAligner)."""
    nw, b = depth_w.shape[:2]
    ws = depth_w.shape[3]
    overlap = ws - stride

    def step(prev_aligned, cur):
        if hcfg.align_type == "affine":
            sol = lstsq_affine_solve(
                cur[:, :, :overlap], prev_aligned[:, :, stride:], pre_inverse=hcfg.align_pre_inverse
            )
            aligned = lstsq_affine_apply(sol, cur, pre_inverse=hcfg.align_pre_inverse)
        else:
            sol = linear_scale_solve(
                cur[:, :, :overlap], prev_aligned[:, :, stride:], pre_inverse=hcfg.align_pre_inverse
            )
            aligned = linear_scale_apply(sol, cur, pre_inverse=hcfg.align_pre_inverse)
        return aligned, aligned

    _, aligned_rest = jax.lax.scan(step, depth_w[0], depth_w[1:])
    aligned = jnp.concatenate([depth_w[:1], aligned_rest], axis=0)
    return stitch_overwrite(aligned, stride, t_total)


def stitch_joint_depth_camray(
    depth_w: jnp.ndarray,  # (nw, B, 1, ws, H, W)
    pose_w: jnp.ndarray,  # (nw, B, 16, ws)
    intr_w: jnp.ndarray,  # (nw, B, 16, ws)
    stride: int,
    t_total: int,
    key: jax.Array,
    num_trials: int = 128,
    min_samples: int = 10,
) -> Dict[str, jnp.ndarray]:
    """Joint Sim(3) alignment chain (reference joint_windowed_estimation,
    dense_heads.py:360-492): each window's point map (from depth+pose+K on
    the overlap) is RANSAC-aligned to the previous aligned window's."""
    nw, b = depth_w.shape[:2]
    ws = depth_w.shape[3]
    overlap = ws - stride

    def step(carry, inp):
        prev_d, prev_p, prev_k = carry
        cur_d, cur_p, cur_k, k_idx = inp
        pred = {
            "depth": cur_d[:, :, :overlap],
            "camray": cur_p[:, :, :overlap],
            "camray_intrinsics": cur_k[:, :, :overlap].reshape(b, 4, 4, overlap),
        }
        tgt = {
            "depth": prev_d[:, :, stride:],
            "camray": prev_p[:, :, stride:],
            "camray_intrinsics": prev_k[:, :, stride:].reshape(b, 4, 4, overlap),
        }
        rel = sim3_overlap_solve(
            pred, tgt, jax.random.fold_in(key, k_idx),
            min_samples=min_samples, num_trials=num_trials,
        )
        applied = sim3_overlap_apply(
            rel, {"depth": cur_d, "camray": cur_p, "camray_intrinsics": cur_k}
        )
        new = (applied["depth"], applied["camray"], cur_k)
        return new, new

    init = (depth_w[0], pose_w[0], intr_w[0])
    _, rest = jax.lax.scan(step, init, (depth_w[1:], pose_w[1:], intr_w[1:], jnp.arange(1, nw)))
    depth_all = jnp.concatenate([depth_w[:1], rest[0]], axis=0)
    pose_all = jnp.concatenate([pose_w[:1], rest[1]], axis=0)
    intr_all = jnp.concatenate([intr_w[:1], rest[2]], axis=0)
    return {
        "depth": stitch_overwrite(depth_all, stride, t_total),
        "camray": stitch_overwrite(pose_all, stride, t_total),
        "camray_intrinsics": stitch_overwrite(intr_all, stride, t_total),
    }


# ---------------------------------------------------------------------------
# forward stages (shared by the monolithic l4p_forward and the split-jit
# InferenceSession in l4p_tpu/inference.py)
# ---------------------------------------------------------------------------

def run_dense_heads_stacked(
    head_params: Dict,
    cfg: "L4PConfig",
    enc_hooks: Dict[int, jnp.ndarray],
    tasks: Sequence[str],
    img_info: Tuple[int, int, int],
) -> Dict[str, jnp.ndarray]:
    """Run the structurally-identical dense heads as ONE compiled body.

    The flow/depth/dyn_mask DPT trunks differ only in the final 1x1 conv's
    out-channels (2/1/1). Compiling one body per head tripled the dominant
    compile cost (~12 s each on the CPU proxy); instead the heads' params
    are stacked (final conv zero-padded to the widest channel count) and ONE
    body runs under an outer lax.map over the head axis. Hook features are
    closed over (not tiled), so no extra HBM traffic.

    Returns {task: (nw, B, C, ws, H, W) activated output} for the stackable
    subset of `tasks`; empty when fewer than two heads stack.
    """
    heads = cfg.head_dict
    stackable = [
        t for t in tasks if t in heads and heads[t].kind in ("flow", "depth", "dyn_mask")
    ]
    stackable = [
        t for t in stackable
        if heads[t].dpt == dataclasses.replace(
            heads[stackable[0]].dpt, num_channels=heads[t].dpt.num_channels
        )
    ]
    if len(stackable) < 2:
        return {}
    hcfgs = [heads[t] for t in stackable]
    maxc = max(h.out_nchan for h in hcfgs)
    nw = enc_hooks[hcfgs[0].dpt.hooks[0]].shape[0]

    def padded(task_name: str, c: int) -> Dict:
        p = dict(head_params[task_name])
        if c < maxc:
            w, bbias = p["head2_2"]["weight"], p["head2_2"]["bias"]
            w = jnp.concatenate([w, jnp.zeros((maxc - c,) + w.shape[1:], w.dtype)], 0)
            bbias = jnp.concatenate([bbias, jnp.zeros((maxc - c,), bbias.dtype)], 0)
            p["head2_2"] = {"weight": w, "bias": bbias}
        return p

    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[padded(t, h.out_nchan) for t, h in zip(stackable, hcfgs)],
    )
    feats0 = [enc_hooks[h_] for h_ in hcfgs[0].dpt.hooks]
    dcfg = dataclasses.replace(hcfgs[0].dpt, num_channels=maxc)

    def per_head(ph):
        def one(fw):
            return dpt_apply(ph, fw, dcfg, img_info)

        return jax.lax.map(one, feats0, batch_size=_map_batch(nw, cfg.dense_window_chunk))

    outs = jax.lax.map(per_head, stacked)  # (H, nw, B, maxc, ws, h, w)
    result: Dict[str, jnp.ndarray] = {}
    for i, (t, hc) in enumerate(zip(stackable, hcfgs)):
        raw = outs[i][:, :, : hc.out_nchan]
        if hc.kind == "depth":
            raw = apply_fn(raw, hc.depth_fn)
        elif hc.kind == "dyn_mask":
            raw = raw.at[:, :, 0].set(apply_fn(raw[:, :, 0], hc.mask_fn))
        result[t] = raw
    return result


def merge_query_chunks(v: jnp.ndarray, n_queries: int) -> jnp.ndarray:
    """(n_chunks, B, chunk, ...) -> (B, n_queries, ...): undo max_queries
    chunking and slice off the padding queries. Shared by run_track_chunked
    and the streaming session's per-window/flush emissions."""
    m = jnp.moveaxis(v, 0, 1)
    m = m.reshape((m.shape[0], m.shape[1] * m.shape[2]) + m.shape[3:])
    return m[:, :n_queries]


def run_track_chunked(
    track_params: Dict,
    tcfg: TrackConfig,
    enc_final: jnp.ndarray,
    queries: jnp.ndarray,
    labels: jnp.ndarray,
    stride: int,
    mesh=None,
) -> Dict[str, jnp.ndarray]:
    """Forward-direction chunked tracking from precomputed features.

    Queries are processed `max_queries` at a time (the reference's memory
    governor, sparse_heads.py:181-211) — but as ONE traced chunk body via
    lax.map over padded chunk groups, not an unrolled Python loop: grid
    sampling can produce thousands of queries (e.g. 2500 on DAVIS) and an
    unrolled graph would take hours to compile.

    With `mesh`, the within-chunk query axis is sharded over the mesh's
    'data' axis: queries are independent streams through the whole track head
    (the (N, ...) axis is a pure batch axis in the two-way transformer, mask
    decoder and softargmax, and each query carries its own memory in the
    windowed scan), so GSPMD propagates the sharding through the scan carries
    and the track stage scales near-linearly across chips."""
    n = queries.shape[1]
    chunk = min(tcfg.max_queries, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    if pad:
        # padded queries get label 0 (the reference's own
        # invalid-query semantics); their outputs are sliced off
        queries = jnp.concatenate([queries, jnp.zeros((queries.shape[0], pad, 3), queries.dtype)], 1)
        labels = jnp.concatenate([labels, jnp.zeros((labels.shape[0], pad), labels.dtype)], 1)
    b_dim = queries.shape[0]
    q_c = queries.reshape(b_dim, n_chunks, chunk, 3).transpose(1, 0, 2, 3)
    l_c = labels.reshape(b_dim, n_chunks, chunk).transpose(1, 0, 2)
    if mesh is not None and "data" in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P

        q_c = jax.lax.with_sharding_constraint(
            q_c, NamedSharding(mesh, P(None, None, "data", None)))
        l_c = jax.lax.with_sharding_constraint(
            l_c, NamedSharding(mesh, P(None, None, "data")))

    def one(args):
        q, l = args
        return track_forward_windowed(
            track_params, tcfg, enc_final, q, l, stride, mesh=mesh
        )

    o = jax.lax.map(one, (q_c, l_c))  # dict of (n_chunks, B, chunk, ...)
    return {k: merge_query_chunks(v, n) for k, v in o.items()}


def stitch_dense_outputs(
    cfg: "L4PConfig",
    tasks: Sequence[str],
    dense_outs: Dict[str, jnp.ndarray],  # task -> (nw, B, C, ws, H, W)
    pose_w: Optional[jnp.ndarray],  # (nw, B, 16, ws) when 'camray' in tasks
    intr_w: Optional[jnp.ndarray],
    stride: int,
    t_total: int,
    key: jax.Array,
) -> Dict[str, jnp.ndarray]:
    """Stitch per-window dense/camray outputs into full-video estimates —
    the single implementation behind both the monolithic l4p_forward and the
    split-jit InferenceSession (reference: per-task forward_windowed
    dispatch, l4p_videomae.py:299-328).

    flow = overwrite with frame-0 skip; dyn_mask = overwrite; depth =
    disparity-affine chain (or joint Sim(3) with camray); camray = pose
    overwrite (+ estimated-K buffer unless use_intrinsics)."""
    heads = cfg.head_dict
    joint = cfg.joint_alignment and ("depth" in tasks) and ("camray" in tasks)
    out: Dict[str, jnp.ndarray] = {}
    for t in tasks:
        hcf = heads.get(t)
        if t == "flow_2d_backward" and t in dense_outs:
            out[f"{hcf.task_name}_est_b2thw"] = stitch_overwrite(
                dense_outs[t], stride, t_total, flow_skip=True
            )
        elif t == "dyn_mask" and t in dense_outs:
            out[f"{hcf.task_name}_est_b1thw"] = stitch_overwrite(dense_outs[t], stride, t_total)
        elif t == "depth" and t in dense_outs and not joint:
            out[f"{hcf.task_name}_est_b1thw"] = stitch_depth_aligned(
                dense_outs[t], stride, t_total, hcf
            )
        elif t == "camray" and pose_w is not None and not joint:
            out[f"{hcf.task_name}_est_b16t"] = stitch_overwrite(pose_w, stride, t_total)
            if not hcf.use_intrinsics:
                # with input intrinsics the reference emits no K estimate
                # (dense_heads.py:309-315 sets intrinsics_est to None)
                out[f"{hcf.task_name}_intrinsics_est_b16t"] = stitch_overwrite(
                    intr_w, stride, t_total
                )
    joint = joint and pose_w is not None and "depth" in dense_outs
    if joint:
        stitched = stitch_joint_depth_camray(
            dense_outs["depth"], pose_w, intr_w, stride, t_total,
            jax.random.fold_in(key, 11),
            num_trials=cfg.sim3_num_trials, min_samples=cfg.sim3_min_samples,
        )
        out["depth_est_b1thw"] = stitched["depth"]
        hname = heads["camray"].task_name
        out[f"{hname}_est_b16t"] = stitched["camray"]
        out[f"{hname}_intrinsics_est_b16t"] = stitched["camray_intrinsics"]
    return out


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------

def l4p_forward(
    params: Dict,
    cfg: L4PConfig,
    data: Dict[str, jnp.ndarray],
    tasks: Sequence[str],
    key: Optional[jax.Array] = None,
    mesh=None,
) -> Dict[str, jnp.ndarray]:
    """All-task sliding-window inference (reference L4P_VideoMAE.forward,
    l4p_videomae.py:256-330).

    data: {'rgb_b3thw' (normalized float) OR 'rgb_u8_bthw3' (raw uint8,
    device-normalized via the fused ingest), optional 'intrinsics_b44t',
    'track_2d_pointquerries_bn3', 'track_2d_pointlabels_bn'}.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    tasks = tuple(tasks)
    rgb_u8 = data.get("rgb_u8_bthw3")
    rgb = data.get("rgb_b3thw")
    if rgb_u8 is not None:
        b, t_total, h_img, w_img = rgb_u8.shape[:4]
    else:
        b, _, t_total, h_img, w_img = rgb.shape
    ws, stride = cfg.window_size[0], cfg.window_stride_t
    assert (h_img, w_img) == cfg.window_size[1:], "fixed spatial size only (l4p_videomae.py:260)"
    nw = (t_total - ws) // stride + 1
    img_info = (ws, h_img, w_img)
    heads = cfg.head_dict
    intr = data.get("intrinsics_b44t")

    enc = encode_windows(
        params["video_encoder"], cfg, rgb, intr, data.get("extrinsics_b44t"),
        mesh=mesh, rgb_u8_bthw3=rgb_u8,
    )

    out: Dict[str, jnp.ndarray] = {}
    _dense_cache: Dict[str, jnp.ndarray] = {}  # filled by the stacked body below
    dense_outs: Dict[str, jnp.ndarray] = {}  # per-window outputs for stitch_dense_outputs
    pose_w = intr_w = None

    def run_dense(task: str) -> jnp.ndarray:
        if task in _dense_cache:
            return _dense_cache[task]
        hcfg = heads[task]
        feats = [enc["hooks"][h_] for h_ in hcfg.dpt.hooks]  # each (nw, B, P, C)

        def one(fw):
            return dense_head_raw(params["task_heads"][task], hcfg, fw, img_info)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = NamedSharding(mesh, P("data"))
            feats_s = [jax.lax.with_sharding_constraint(f, spec) for f in feats]
            return jax.vmap(lambda *fs: one(list(fs)))(*feats_s)
        return jax.lax.map(one, feats, batch_size=_map_batch(nw, cfg.dense_window_chunk))

    joint = cfg.joint_alignment and ("depth" in tasks) and ("camray" in tasks)

    if mesh is None:
        _dense_cache.update(
            run_dense_heads_stacked(params["task_heads"], cfg, enc["hooks"], tasks, img_info)
        )

    def run_track_forward(enc_final, queries, labels) -> Dict[str, jnp.ndarray]:
        return run_track_chunked(
            params["task_heads"]["track_2d"], cfg.track, enc_final, queries, labels, stride,
            mesh=mesh,
        )

    for task in tasks:
        if task == "track_2d":
            tcfg = cfg.track
            dirs = tuple(tcfg.estimation_directions)
            queries = data["track_2d_pointquerries_bn3"]
            labels = data["track_2d_pointlabels_bn"]
            fwd_out = run_track_forward(enc["final"], queries, labels) if 1 in dirs else None
            if -1 in dirs:
                # backward via the reference's prescribed video flip
                # (sparse_heads.py:242-245); one extra encoder pass only
                flipped = dict(data)
                if rgb_u8 is not None:
                    flipped["rgb_u8_bthw3"] = jnp.flip(rgb_u8, axis=1)
                if rgb is not None:
                    flipped["rgb_b3thw"] = jnp.flip(rgb, axis=2)
                if intr is not None:
                    flipped["intrinsics_b44t"] = jnp.flip(intr, axis=3)
                if "extrinsics_b44t" in data:
                    flipped["extrinsics_b44t"] = jnp.flip(data["extrinsics_b44t"], axis=3)
                flipped["track_2d_pointquerries_bn3"] = queries.at[:, :, 0].set(
                    t_total - queries[:, :, 0]
                )
                import dataclasses as _dc

                fwd_cfg = _dc.replace(cfg, track=_dc.replace(tcfg, estimation_directions=(1,)))
                bwd_raw = l4p_forward(params, fwd_cfg, flipped, ("track_2d",), key, mesh=mesh)
                bwd_out = {k: jnp.flip(v, axis=-1) for k, v in bwd_raw.items()}
                if fwd_out is None:
                    out.update(bwd_out)
                else:
                    t_ids = jnp.arange(t_total, dtype=queries.dtype) + 0.5
                    after = (t_ids[None, None, None, :] - queries[:, :, 0:1, None]) >= 0
                    out.update({k: jnp.where(after, fwd_out[k], bwd_out[k]) for k in fwd_out})
            else:
                out.update(fwd_out)
        elif task == "flow_2d_backward":
            w_outs = run_dense(task)
            dense_outs[task] = w_outs
        elif task == "dyn_mask":
            dense_outs[task] = run_dense(task)
        elif task in heads and heads[task].kind == "camera_rays":
            # raw ray-map head: overwrite stitch, no aligner
            # (dense_heads.py:220-254 with overlap_aligner_type=None)
            w_outs = run_dense(task)
            out[f"{heads[task].task_name}_est_b{heads[task].out_nchan}thw"] = stitch_overwrite(
                w_outs, stride, t_total
            )
        elif task == "depth":
            dense_outs[task] = run_dense(task)
        elif task == "camray":
            rays_w = run_dense(task).astype(jnp.float32)
            pose_w, intr_w = camray_windows_to_cameras(
                rays_w, heads[task], img_info, intr, stride, jax.random.fold_in(key, 7)
            )
        else:
            raise ValueError(f"unknown task {task}")

    out.update(stitch_dense_outputs(
        cfg, tasks, dense_outs, pose_w, intr_w, stride, t_total, key
    ))
    return out


def track_bidirectional(
    params: Dict,
    cfg: L4PConfig,
    data: Dict[str, jnp.ndarray],
    key: Optional[jax.Array] = None,
    directions: Tuple[int, ...] = (1, -1),
    mesh=None,
) -> Dict[str, jnp.ndarray]:
    """Backward / bidirectional tracking (estimation_directions=[-1] or
    [1,-1]).

    The reference's windowed tracker is forward-only and its own comment
    prescribes exactly this scheme: "Run twice, with and without video
    flipping, and then combine outputs" (sparse_heads.py:242-245). Forward
    results cover t >= query time; the time-flipped pass covers t < query
    time; outputs are merged on that boundary. Implemented inside
    l4p_forward's track branch (shares the forward encoder pass with the
    other tasks); this is the standalone convenience wrapper.
    """
    import dataclasses as _dc

    bi_cfg = _dc.replace(cfg, track=_dc.replace(cfg.track, estimation_directions=tuple(directions)))
    return l4p_forward(params, bi_cfg, data, ("track_2d",), key, mesh=mesh)


def l4p_forward_single_window(
    params: Dict,
    cfg: L4PConfig,
    data: Dict[str, jnp.ndarray],
    tasks: Sequence[str],
    key: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """One 16-frame window, no stitching (reference forward_single_window,
    l4p_videomae.py:234-254)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    rgb = data["rgb_b3thw"]
    heads = cfg.head_dict
    img_info = (rgb.shape[2], rgb.shape[3], rgb.shape[4])
    hooks = cfg.all_hooks
    enc = encoder_apply(params["video_encoder"], rgb, cfg.encoder, hooks=hooks, want_final=True)
    feat_by_hook = {h_: f for h_, f in zip(hooks, enc["hooks"])}
    intr = data.get("intrinsics_b44t")

    out: Dict[str, jnp.ndarray] = {}
    for task in tasks:
        if task == "track_2d":
            o = track_forward(
                params["task_heads"]["track_2d"], cfg.track, enc["final"],
                data["track_2d_pointquerries_bn3"], data["track_2d_pointlabels_bn"],
            )
            out.update({k: v for k, v in o.items() if not k.endswith("bnpc")
                        and not k.endswith("_prompt_features_bnc")})
            continue
        hcfg = heads[task]
        feats = [feat_by_hook[h_] for h_ in hcfg.dpt.hooks]
        raw = dense_head_raw(params["task_heads"][task], hcfg, feats, img_info)
        if hcfg.kind == "camray":
            pose_w, intr_w = camray_windows_to_cameras(
                raw[None].astype(jnp.float32), hcfg, img_info, intr, cfg.window_stride_t, key
            )
            out[f"{hcfg.task_name}_est_b16t"] = pose_w[0]
            if not hcfg.use_intrinsics:
                out[f"{hcfg.task_name}_intrinsics_est_b16t"] = intr_w[0]
        else:
            out[f"{hcfg.task_name}_est_{hcfg.task_suffix}"] = raw
    return out
