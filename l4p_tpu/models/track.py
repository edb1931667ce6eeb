"""Promptable 2D/3D point-tracking head (SAM-style) — single-window forward
and the causal sliding-window scan.

Re-designs the reference VideoMAETrack2DSamHead (reference:
l4p/models/task_heads/sparse_heads.py:19-667):
  * queries are a batch dimension end-to-end (no per-batch Python loop,
    sparse_heads.py:542-555);
  * the per-point re-query loop (sparse_heads.py:464-479) is one
    argmax + gather;
  * the sliding-window carry (re-queries, prompt features, masked token
    memory) becomes a `lax.scan` over windows with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from l4p_tpu.models.sam import (
    SamConfig,
    dense_pe,
    mask_decoder_apply,
    prompt_encoder_apply,
)
from l4p_tpu.ops.conv import linear
from l4p_tpu.ops.misc import apply_fn
from l4p_tpu.ops.resize import interpolate_trilinear


@dataclasses.dataclass(frozen=True)
class TrackConfig:
    task_name: str = "track_2d"
    image_size: Tuple[int, int, int] = (16, 224, 224)
    patch_size: Tuple[int, int, int] = (2, 14, 14)
    estimate_vis: bool = True
    estimate_depth: bool = True
    modify_pointlabels_for_windowing: bool = True
    prompt_using_features: bool = True
    attend_to_past: bool = True
    depth_fn: str = "exp"
    vis_fn: str = "linear"
    max_queries: int = 128
    num_prompt_points: int = 2
    sam: SamConfig = dataclasses.field(default_factory=SamConfig)

    @property
    def token_ids(self) -> Dict[str, int]:
        ids = {"xy": 0}
        n = 1
        if self.estimate_vis:
            ids["vis"] = n
            n += 1
        if self.estimate_depth:
            ids["depth"] = n
            n += 1
        if self.prompt_using_features:
            ids["prompt_feat"] = n + self.num_prompt_points
        return ids

    @property
    def num_mask_tokens(self) -> int:
        return 1 + int(self.estimate_vis) + int(self.estimate_depth)


def softargmax_xy(logits_nthw: jnp.ndarray, image_hw: Tuple[int, int]) -> jnp.ndarray:
    """Soft-argmax over HxW with pixel-center grid
    (sparse_heads.py:140-155). logits: (N, T, H, W) -> (N, T, 2) as (x, y)."""
    n, t, h, w = logits_nthw.shape
    heat = jax.nn.softmax(logits_nthw.reshape(n, t, h * w).astype(jnp.float32), axis=-1)
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)
    grid_x = jnp.broadcast_to(xs[None, :], (h, w)).reshape(-1)
    grid_y = jnp.broadcast_to(ys[:, None], (h, w)).reshape(-1)
    x_est = (heat * grid_x).sum(-1)
    y_est = (heat * grid_y).sum(-1)
    return jnp.stack([x_est, y_est], axis=-1)


def track_forward_item(
    params: Dict,
    cfg: TrackConfig,
    enc_features: jnp.ndarray,  # (P, C) shared or (N, P, C) per-query tokens
    queries_n3: jnp.ndarray,
    labels_n: jnp.ndarray,
    prompt_features_nc: Optional[jnp.ndarray] = None,
    prompt_feature_labels_n: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Single-window, single-batch-item forward (reference
    sparse_heads.py:497-667 with N as the decoder batch)."""
    sam = cfg.sam
    n = queries_n3.shape[0]

    sparse = prompt_encoder_apply(
        params["prompt_encoder"],
        sam,
        queries_n3[:, None, :],
        labels_n[:, None],
        prompt_features_nc[:, None, :] if prompt_features_nc is not None else None,
        prompt_feature_labels_n[:, None] if prompt_feature_labels_n is not None else None,
    )

    img = enc_features if enc_features.ndim == 3 else enc_features[None]
    pe = dense_pe(params["prompt_encoder"], sam)
    logits, processed = mask_decoder_apply(params["mask_decoder"], sam, img, pe, sparse)

    # (N, M, 2t, 4h, 4w) -> (N, M, T, H, W); align_corners=False
    # (sparse_heads.py:645-647)
    logits = interpolate_trilinear(logits, cfg.image_size, align_corners=False)

    tid = cfg.token_ids
    out: Dict[str, jnp.ndarray] = {}
    xy = softargmax_xy(logits[:, tid["xy"]], cfg.image_size[1:])  # (N, T, 2)
    out["traj_nt2"] = xy
    if cfg.estimate_vis:
        vis = logits[:, tid["vis"]].mean(axis=(-1, -2))
        out["vis_nt"] = apply_fn(vis, cfg.vis_fn)
    if cfg.estimate_depth:
        dep = logits[:, tid["depth"]].mean(axis=(-1, -2))
        out["depth_nt"] = apply_fn(dep, cfg.depth_fn)

    if cfg.prompt_using_features:
        pf = processed["io_features"][:, tid["prompt_feat"], :]
        out["prompt_features_nc"] = linear(
            pf, params["prompt_feature_linear"]["weight"], params["prompt_feature_linear"]["bias"]
        )
    if cfg.attend_to_past:
        out["enc_history_npc"] = linear(
            processed["enc_features"],
            params["processed_video_features_proj"]["weight"],
            params["processed_video_features_proj"]["bias"],
        )
    return out


def track_forward(
    params: Dict,
    cfg: TrackConfig,
    enc_features_bpc: jnp.ndarray,  # (B, P, C) or (B, N, P, C)
    queries_bn3: jnp.ndarray,
    labels_bn: jnp.ndarray,
    prompt_features_bnc: Optional[jnp.ndarray] = None,
    prompt_feature_labels_bn: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Batched single-window forward; returns reference-shaped outputs
    ({task}_traj_est_bn2t etc., sparse_heads.py:566-591)."""
    fn = lambda e, q, l, pf, pfl: track_forward_item(params, cfg, e, q, l, pf, pfl)
    in_axes = (0, 0, 0, 0 if prompt_features_bnc is not None else None,
               0 if prompt_feature_labels_bn is not None else None)
    item = jax.vmap(fn, in_axes=in_axes)(
        enc_features_bpc, queries_bn3, labels_bn, prompt_features_bnc, prompt_feature_labels_bn
    )
    t = cfg.task_name
    out = {f"{t}_traj_est_bn2t": item["traj_nt2"].transpose(0, 1, 3, 2)}
    if cfg.estimate_vis:
        out[f"{t}_vis_est_bn1t"] = item["vis_nt"][:, :, None, :]
    if cfg.estimate_depth:
        out[f"{t}_depth_est_bn1t"] = item["depth_nt"][:, :, None, :]
    if cfg.prompt_using_features:
        out[f"{t}_prompt_features_bnc"] = item["prompt_features_nc"]
    if cfg.attend_to_past:
        out[f"{t}_enc_features_with_track_history_bnpc"] = item["enc_history_npc"]
    return out
