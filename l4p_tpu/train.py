"""Training: multi-task losses, optimizer, and the sharded train step.

The reference ships optimizer/scheduler plumbing but no loss module
(reference l4p/l4p.py:69-71, :111-126: pluggable `loss_module(batch, out) ->
(loss, loss_dict, metadata)`, AdamW + OneCycleLR stepped per-iteration).
This module supplies the TPU-native equivalents: a functional loss with the
same contract, optax AdamW + one-cycle schedule, and a pjit-able train step
over a (data, model) mesh.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from l4p_tpu.models.l4p import L4PConfig, dense_head_raw
from l4p_tpu.models.encoder import encoder_apply
from l4p_tpu.models.track import track_forward, softargmax_xy
from l4p_tpu.geometry.core import get_rays_plucker, normalize_intrinsics


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    if mask is None:
        return x.mean()
    m = mask.astype(jnp.float32)
    m = jnp.broadcast_to(m, x.shape)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def l4p_loss(
    params: Dict,
    cfg: L4PConfig,
    batch: Dict[str, jnp.ndarray],
    tasks: Sequence[str],
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Single-window multi-task loss with the reference loss-module contract
    (l4p.py:69-71). Batch keys follow the L4PData schema
    (l4p_dataset_mini.py:16-44)."""
    rgb = batch["rgb_b3thw"]
    img_info = (rgb.shape[2], rgb.shape[3], rgb.shape[4])
    heads = cfg.head_dict
    hooks = cfg.all_hooks
    enc = encoder_apply(params["video_encoder"], rgb, cfg.encoder, hooks=hooks, want_final=True)
    feat_by_hook = {h: f for h, f in zip(hooks, enc["hooks"])}

    losses: Dict[str, jnp.ndarray] = {}
    for task in tasks:
        if task == "depth":
            hcfg = heads[task]
            feats = [feat_by_hook[h] for h in hcfg.dpt.hooks]
            pred = dense_head_raw(params["task_heads"][task], hcfg, feats, img_info)
            gt = batch["depth_b1thw"]
            valid = batch.get("depth_valid_b1thw")
            safe_gt = jnp.maximum(gt, 1e-6)
            losses["depth"] = _masked_mean(
                jnp.abs(jnp.log(jnp.maximum(pred, 1e-6)) - jnp.log(safe_gt)), valid
            )
        elif task == "flow_2d_backward":
            hcfg = heads[task]
            feats = [feat_by_hook[h] for h in hcfg.dpt.hooks]
            pred = dense_head_raw(params["task_heads"][task], hcfg, feats, img_info)
            gt = batch["flow_2d_backward_b2thw"]
            valid = batch.get("flow_2d_backward_valid_b2thw")  # per-channel mask (dataset.py schema)
            losses["flow"] = _masked_mean(jnp.abs(pred - gt), valid)
        elif task == "dyn_mask":
            hcfg = heads[task]
            feats = [feat_by_hook[h] for h in hcfg.dpt.hooks]
            logits = dense_head_raw(params["task_heads"][task], hcfg, feats, img_info)
            gt = batch["dyn_mask_b1thw"]
            valid = batch.get("dyn_mask_valid_b1thw")
            bce = optax.sigmoid_binary_cross_entropy(logits.astype(jnp.float32), gt.astype(jnp.float32))
            losses["dyn_mask"] = _masked_mean(bce, valid)
        elif task == "camray":
            hcfg = heads[task]
            feats = [feat_by_hook[h] for h in hcfg.dpt.hooks]
            rays_pred = dense_head_raw(params["task_heads"][task], hcfg, feats, img_info)
            h_img, w_img = img_info[1], img_info[2]
            k_norm = normalize_intrinsics(batch["intrinsics_b44t"].astype(jnp.float32), h_img, w_img)
            rays_gt, _ = get_rays_plucker(
                k_norm, batch["extrinsics_b44t"].astype(jnp.float32),
                rays_pred.shape[-2:], make_first_cam_ref=True,
            )
            # GT rays at the head's output grid (t matches via tubelet interp)
            if rays_gt.shape[2] != rays_pred.shape[2]:
                idx = jnp.linspace(0, rays_gt.shape[2] - 1, rays_pred.shape[2]).astype(jnp.int32)
                rays_gt = rays_gt[:, :, idx]
            losses["camray"] = jnp.abs(rays_pred.astype(jnp.float32) - rays_gt).mean()
        elif task == "track_2d":
            tcfg = cfg.track
            out = track_forward(
                params["task_heads"]["track_2d"], tcfg, enc["final"],
                batch["track_2d_pointquerries_bn3"], batch["track_2d_pointlabels_bn"],
            )
            gt_traj = batch["track_2d_traj_bn2t"]
            valid = batch.get("track_2d_valid_bn1t")
            losses["track_xy"] = _masked_mean(
                jnp.abs(out["track_2d_traj_est_bn2t"] - gt_traj), valid
            ) / max(img_info[1], 1)
            if tcfg.estimate_vis and "track_2d_vis_bn1t" in batch:
                bce = optax.sigmoid_binary_cross_entropy(
                    out["track_2d_vis_est_bn1t"].astype(jnp.float32),
                    batch["track_2d_vis_bn1t"].astype(jnp.float32),
                )
                losses["track_vis"] = _masked_mean(bce, valid)
            if tcfg.estimate_depth and "track_2d_depth_bn1t" in batch:
                losses["track_depth"] = _masked_mean(
                    jnp.abs(
                        jnp.log(jnp.maximum(out["track_2d_depth_est_bn1t"], 1e-6))
                        - jnp.log(jnp.maximum(batch["track_2d_depth_bn1t"], 1e-6))
                    ),
                    valid,
                )
        else:
            raise ValueError(f"unknown task {task}")

    total = functools.reduce(lambda a, b: a + b, losses.values())
    return total, losses


def make_optimizer(
    lr: float = 1e-4,
    total_steps: int = 10000,
    weight_decay: float = 0.05,
    pct_start: float = 0.1,
    clip_norm: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW + one-cycle schedule (reference configure_optimizers,
    l4p.py:111-126) with global-norm clipping (the exp-depth head makes
    unclipped early steps explosive)."""
    # optax's one-cycle NaNs if the warmup phase rounds to zero steps —
    # ensure at least one step of warmup
    pct_start = max(pct_start, min(2.0 / max(total_steps, 2), 0.5))
    sched = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 4), peak_value=lr, pct_start=pct_start
    )
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def train_step(
    params: Dict,
    opt_state,
    batch: Dict[str, jnp.ndarray],
    cfg: L4PConfig,
    tasks: Sequence[str],
    optimizer: optax.GradientTransformation,
):
    """One optimization step; jit/pjit this with params sharded via
    l4p_tpu.parallel.mesh (DP over batch + TP over the encoder)."""
    (loss, loss_dict), grads = jax.value_and_grad(
        lambda p: l4p_loss(p, cfg, batch, tasks), has_aux=True
    )(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, loss_dict
