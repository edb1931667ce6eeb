"""Evaluation metrics for all five tasks.

The reference defines the metrics-module contract but ships no
implementation (reference l4p/l4p.py:74-78: `metrics_module(batch, out,
metadata) -> (metrics_dict, _)`). These are the standard metrics for each
task family (depth AbsRel/delta-threshold, flow EPE, mask IoU, TAP-style
track accuracy, pose errors), pure jnp.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp


def _masked_mean(x, mask):
    x = x.astype(jnp.float32)
    if mask is None:
        return x.mean()
    m = jnp.broadcast_to(mask.astype(jnp.float32), x.shape)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


def depth_metrics(pred_b1thw, gt_b1thw, valid=None, median_align: bool = True) -> Dict[str, jnp.ndarray]:
    """AbsRel, RMSE, delta<1.25 — optionally per-video median-scaled
    (metric-ambiguous depth, as the paper evaluates)."""
    pred = pred_b1thw.astype(jnp.float32)
    gt = jnp.maximum(gt_b1thw.astype(jnp.float32), 1e-6)
    if median_align:
        if valid is not None:
            # medians over valid pixels only (sparse GT would otherwise pull
            # the gt median to the invalid fill value)
            v = jnp.broadcast_to(valid > 0, gt.shape)
            med_gt = jnp.nanmedian(jnp.where(v, gt, jnp.nan))
            med_pr = jnp.nanmedian(jnp.where(v, pred, jnp.nan))
        else:
            med_gt, med_pr = jnp.median(gt), jnp.median(pred)
        s = med_gt / jnp.maximum(med_pr, 1e-6)
        pred = pred * s
    pred = jnp.maximum(pred, 1e-6)
    absrel = _masked_mean(jnp.abs(pred - gt) / gt, valid)
    rmse = jnp.sqrt(_masked_mean((pred - gt) ** 2, valid))
    ratio = jnp.maximum(pred / gt, gt / pred)
    d1 = _masked_mean((ratio < 1.25).astype(jnp.float32), valid)
    return {"depth/absrel": absrel, "depth/rmse": rmse, "depth/delta1": d1}


def flow_metrics(pred_b2thw, gt_b2thw, valid=None) -> Dict[str, jnp.ndarray]:
    epe = jnp.sqrt(((pred_b2thw.astype(jnp.float32) - gt_b2thw.astype(jnp.float32)) ** 2).sum(1, keepdims=True))
    if valid is not None and valid.ndim == epe.ndim and valid.shape[1] != 1:
        # dataset masks are per-channel (B,2,T,H,W); a pixel counts when both
        # components are valid
        valid = jnp.min(valid, axis=1, keepdims=True)
    return {
        "flow/epe": _masked_mean(epe, valid),
        "flow/1px": _masked_mean((epe < 1.0).astype(jnp.float32), valid),
        "flow/3px": _masked_mean((epe < 3.0).astype(jnp.float32), valid),
    }


def dyn_mask_metrics(logits_b1thw, gt_b1thw, valid=None, threshold: float = 0.85) -> Dict[str, jnp.ndarray]:
    """IoU at the reference's visualization threshold (vis.py:82-84)."""
    prob = 1.0 / (1.0 + jnp.exp(-logits_b1thw.astype(jnp.float32)))
    pred = prob > threshold
    gt = gt_b1thw > 0.5
    if valid is not None:
        v = jnp.broadcast_to(valid > 0, pred.shape)
        pred = jnp.logical_and(pred, v)
        gt = jnp.logical_and(gt, v)
    inter = jnp.logical_and(pred, gt).sum()
    union = jnp.logical_or(pred, gt).sum()
    return {"dyn_mask/iou": inter / jnp.maximum(union, 1)}


def track_metrics(
    pred_traj_bn2t, pred_vis_bn1t, gt_traj_bn2t, gt_vis_bn1t, valid_bn1t=None,
    thresholds: Tuple[float, ...] = (1.0, 2.0, 4.0, 8.0, 16.0),
) -> Dict[str, jnp.ndarray]:
    """TAP-Vid-style: delta_avg (position accuracy at pixel thresholds over
    visible points), occlusion accuracy, and average Jaccard."""
    err = jnp.sqrt(((pred_traj_bn2t.astype(jnp.float32) - gt_traj_bn2t.astype(jnp.float32)) ** 2).sum(2, keepdims=True))
    gt_vis = jnp.ones_like(err, bool) if gt_vis_bn1t is None else gt_vis_bn1t > 0.5
    # no visibility estimate => treat everything as visible
    pred_vis = jnp.ones_like(gt_vis) if pred_vis_bn1t is None else pred_vis_bn1t > 0.0
    valid = jnp.ones_like(gt_vis) if valid_bn1t is None else (valid_bn1t > 0)
    eval_pts = jnp.logical_and(gt_vis, valid)

    out: Dict[str, jnp.ndarray] = {}
    deltas = []
    jaccards = []
    for thr in thresholds:
        within = err < thr
        correct = _masked_mean(within.astype(jnp.float32), eval_pts)
        deltas.append(correct)
        # Jaccard: TP = visible, predicted visible, within thr
        tp = jnp.logical_and(jnp.logical_and(within, pred_vis), eval_pts).sum()
        fp = jnp.logical_and(pred_vis, jnp.logical_or(~within, ~gt_vis)) & valid
        fn = jnp.logical_and(eval_pts, jnp.logical_or(~within, ~pred_vis)).sum()
        jaccards.append(tp / jnp.maximum(tp + fp.sum() + fn, 1))
    out["track/delta_avg"] = jnp.stack(deltas).mean()
    out["track/aj"] = jnp.stack(jaccards).mean()
    occ_correct = (pred_vis == gt_vis) & valid
    out["track/occ_acc"] = _masked_mean(occ_correct.astype(jnp.float32), valid)
    return out


def pose_metrics(pred_pose_b16t, gt_pose_b16t) -> Dict[str, jnp.ndarray]:
    """Rotation geodesic error (deg) and translation RMSE after making both
    trajectories first-frame-relative."""
    b = pred_pose_b16t.shape[0]
    t = pred_pose_b16t.shape[-1]
    p = pred_pose_b16t.reshape(b, 4, 4, t).transpose(0, 3, 1, 2).astype(jnp.float32)
    g = gt_pose_b16t.reshape(b, 4, 4, t).transpose(0, 3, 1, 2).astype(jnp.float32)
    p = jnp.matmul(jnp.linalg.inv(p[:, :1]), p)
    g = jnp.matmul(jnp.linalg.inv(g[:, :1]), g)
    r_rel = jnp.matmul(p[:, :, :3, :3].transpose(0, 1, 3, 2), g[:, :, :3, :3])
    tr = jnp.trace(r_rel, axis1=-2, axis2=-1)
    ang = jnp.degrees(jnp.arccos(jnp.clip((tr - 1) / 2, -1, 1)))
    t_err = jnp.sqrt(((p[:, :, :3, 3] - g[:, :, :3, 3]) ** 2).sum(-1))
    return {"pose/rot_deg": ang.mean(), "pose/trans_rmse": jnp.sqrt((t_err ** 2).mean())}


def l4p_metrics(batch: Dict, out: Dict, metadata: Optional[Dict] = None) -> Tuple[Dict, Dict]:
    """Reference metrics-module contract (l4p.py:74-78): compute everything
    the batch has ground truth for."""
    m: Dict[str, jnp.ndarray] = {}
    if "depth_est_b1thw" in out and "depth_b1thw" in batch:
        m.update(depth_metrics(out["depth_est_b1thw"], batch["depth_b1thw"], batch.get("depth_valid_b1thw")))
    if "flow_2d_backward_est_b2thw" in out and "flow_2d_backward_b2thw" in batch:
        m.update(flow_metrics(out["flow_2d_backward_est_b2thw"], batch["flow_2d_backward_b2thw"],
                              batch.get("flow_2d_backward_valid_b2thw")))
    if "dyn_mask_est_b1thw" in out and "dyn_mask_b1thw" in batch:
        m.update(dyn_mask_metrics(out["dyn_mask_est_b1thw"], batch["dyn_mask_b1thw"],
                                  batch.get("dyn_mask_valid_b1thw")))
    if "track_2d_traj_est_bn2t" in out and "track_2d_traj_bn2t" in batch:
        m.update(track_metrics(out["track_2d_traj_est_bn2t"], out.get("track_2d_vis_est_bn1t"),
                               batch["track_2d_traj_bn2t"], batch.get("track_2d_vis_bn1t"),
                               batch.get("track_2d_valid_bn1t")))
    if "traj3d_est_b16t" in out and "extrinsics_b44t" in batch:
        t = batch["extrinsics_b44t"].shape[-1]
        gt_pose = jnp.linalg.inv(
            batch["extrinsics_b44t"].transpose(0, 3, 1, 2)
        ).transpose(0, 2, 3, 1).reshape(-1, 16, t)
        m.update(pose_metrics(out["traj3d_est_b16t"], gt_pose))
    return m, {}
