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
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Single-window multi-task loss with the reference loss-module contract
    (l4p.py:69-71). Batch keys follow the L4PData schema
    (l4p_dataset_mini.py:16-44).

    SCOPE: training operates on single-window clips (T == window size), the
    standard regime for this architecture — the released reference ships no
    loss at all and its training hooks are likewise per-clip (l4p.py:54-71).
    Multi-window *inference* stitching (scan carries, aligners) is
    inference-only and not differentiated through.
    """
    rgb = batch["rgb_b3thw"]
    assert rgb.shape[2] == cfg.window_size[0], (
        f"l4p_loss trains on single-window clips: T={rgb.shape[2]} != "
        f"window {cfg.window_size[0]} — crop/sample clips to the window "
        "length in the data pipeline (L4PDataset does by default)"
    )
    img_info = (rgb.shape[2], rgb.shape[3], rgb.shape[4])
    heads = cfg.head_dict
    hooks = cfg.all_hooks
    enc_params = params["video_encoder"]
    if cfg.freeze_video_encoder and cfg.unfreeze_blocks is None:
        # `is None` (not falsy) so that unfreeze_blocks=() matches
        # trainable_mask and the reference's `is not None` check
        # (l4p_videomae.py:203-208): an empty tuple still marks the final
        # norm trainable, so gradients must flow to it.
        # fully-frozen encoder: stop-gradient the encoder PARAMS, exactly
        # like the reference's requires_grad=False (l4p_videomae.py:203-204)
        # — the block scan then has no differentiable inputs, so autodiff
        # skips it entirely: no encoder backward, no stored residuals. (With
        # unfreeze_blocks the backward must flow, and the optimizer mask
        # zeroes the frozen slices instead.)
        enc_params = jax.tree.map(jax.lax.stop_gradient, enc_params)
    # stochastic depth fires only when the caller provides a per-step key
    # (training); eval/no-key is deterministic (reference DropPath semantics)
    dp_key = key if (key is not None and cfg.encoder.drop_path_rate > 0) else None
    enc = encoder_apply(
        enc_params, rgb, cfg.encoder, hooks=hooks, want_final=True,
        drop_path_key=dp_key,
    )
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


def trainable_mask(params: Dict, cfg: L4PConfig) -> Dict:
    """Per-parameter trainability multipliers (1.0 train / 0.0 frozen),
    same pytree structure as `params`.

    Functional equivalent of the reference's requires_grad toggles
    (l4p_videomae.py:199-218): `freeze_video_encoder` freezes the encoder;
    `unfreeze_blocks` re-enables listed ViT blocks plus the final norm;
    `freeze_heads` freezes whole task heads. Because encoder blocks are
    stacked along a leading depth axis here, per-block unfreezing is a
    (depth, 1, ...) multiplier on the stacked leaves rather than a per-leaf
    bool. The (non-learnable) sinusoid pos_embed is always frozen — it is a
    buffer in the reference, and letting AdamW weight-decay it would corrupt
    a constant.
    """
    enc_cfg = cfg.encoder

    def const(tree, val: float):
        return jax.tree.map(lambda _: val, tree)

    enc = params["video_encoder"]
    enc_mask: Dict = {}
    if cfg.freeze_video_encoder:
        ub = tuple(cfg.unfreeze_blocks) if cfg.unfreeze_blocks is not None else ()
        import numpy as np

        blk_vec = np.zeros((enc_cfg.depth,), np.float32)
        if ub:
            blk_vec[list(ub)] = 1.0
        for k, v in enc.items():
            if k == "blocks":
                enc_mask[k] = {
                    kk: jnp.asarray(blk_vec.reshape((enc_cfg.depth,) + (1,) * (vv.ndim - 1)))
                    for kk, vv in v.items()
                }
            elif k == "norm":
                # unfreeze_blocks also re-enables head+norm (l4p_videomae.py:205-208)
                enc_mask[k] = const(v, 1.0 if cfg.unfreeze_blocks is not None else 0.0)
            else:  # patch_embed, pos_embed, cam_emb
                enc_mask[k] = const(v, 0.0)
    else:
        for k, v in enc.items():
            if k == "pos_embed" and not enc_cfg.use_learnable_pos_emb:
                enc_mask[k] = const(v, 0.0)
            else:
                enc_mask[k] = const(v, 1.0)

    heads_mask = {
        name: const(sub, 0.0 if name in cfg.freeze_heads else 1.0)
        for name, sub in params["task_heads"].items()
    }
    return {"video_encoder": enc_mask, "task_heads": heads_mask}


def apply_trainable_mask(mask: Dict) -> optax.GradientTransformation:
    """Multiply updates elementwise by the trainability mask. Placed before
    AdamW it zeroes frozen gradients (keeps them out of the clip norm and the
    moments); placed after, it kills the weight-decay drift on frozen
    (slices of) parameters so they stay bitwise unchanged."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        out = jax.tree.map(lambda g, m: g * jnp.asarray(m, dtype=g.dtype), updates, mask)
        return out, state

    return optax.GradientTransformation(init_fn, update_fn)


def _fully_trainable(mask: Dict) -> Dict:
    """Leaf-level bools: True where any slice of the leaf is trainable —
    drives optax.masked so fully-frozen leaves get no AdamW moments
    (for a frozen 1B-param encoder that saves ~8 GB of fp32 moments)."""
    import numpy as np

    return jax.tree.map(lambda m: bool(np.any(np.asarray(m) > 0)), mask)


def make_optimizer(
    lr: float = 1e-4,
    total_steps: int = 10000,
    weight_decay: float = 0.05,
    pct_start: float = 0.1,
    clip_norm: float = 1.0,
    mask: Optional[Dict] = None,
) -> optax.GradientTransformation:
    """AdamW + one-cycle schedule (reference configure_optimizers,
    l4p.py:111-126) with global-norm clipping (the exp-depth head makes
    unclipped early steps explosive). `mask` (from trainable_mask) freezes
    parameters exactly: zero gradients into the clip/moments, no moment
    state for fully-frozen leaves, and no weight-decay drift."""
    # optax's one-cycle NaNs if the warmup phase rounds to zero steps —
    # ensure at least one step of warmup
    pct_start = max(pct_start, min(2.0 / max(total_steps, 2), 0.5))
    sched = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 4), peak_value=lr, pct_start=pct_start
    )
    adamw = optax.adamw(sched, weight_decay=weight_decay)
    if mask is None:
        return optax.chain(optax.clip_by_global_norm(clip_norm), adamw)
    return optax.chain(
        apply_trainable_mask(mask),
        optax.clip_by_global_norm(clip_norm),
        optax.masked(adamw, _fully_trainable(mask)),
        apply_trainable_mask(mask),
    )


def train_step(
    params: Dict,
    opt_state,
    batch: Dict[str, jnp.ndarray],
    cfg: L4PConfig,
    tasks: Sequence[str],
    optimizer: optax.GradientTransformation,
    key: Optional[jax.Array] = None,
):
    """One optimization step; jit/pjit this with params sharded via
    l4p_tpu.parallel.mesh (DP over batch + TP over the encoder). `key` feeds
    stochastic depth when cfg.encoder.drop_path_rate > 0."""
    (loss, loss_dict), grads = jax.value_and_grad(
        lambda p: l4p_loss(p, cfg, batch, tasks, key=key), has_aux=True
    )(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, loss_dict
