"""Plucker rays -> camera extrinsics / intrinsics, fully on-device.

Replaces the reference's CPU escapes (reference l4p/utils/geometry_utils.py):
  * per-(b,t) Python-loop Kabsch SVD (geometry_utils.py:392-398, :562-567)
      -> one vmapped batched 3x3 SVD;
  * cv2.findHomography(RANSAC) + cv2.RQDecomp3x3 (geometry_utils.py:436-456)
      -> fixed-trial batched DLT hypothesis scoring + QR-based RQ, all jnp.
All math fp32 (mirrors the reference's fp32 islands, geometry_utils.py:505).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from l4p_tpu.geometry.core import (
    _pixel_grid,
    denormalize_intrinsics,
    normalize_intrinsics,
    plucker_to_point_direction,
    ransac_sample_indices,
)


def intersect_skew_lines_high_dim(
    points: jnp.ndarray, directions: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest point to a bundle of skew lines (geometry_utils.py:249-282).
    points/directions: (B, R, D). Returns (p (B,D), normalized dirs)."""
    dim = points.shape[-1]
    if mask is None:
        mask = jnp.ones_like(points[..., 0])
    d = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    eye = jnp.eye(dim, dtype=points.dtype)[None, None]
    i_min_cov = (eye - d[..., None] * d[..., None, :]) * mask[..., None, None]
    sum_proj = jnp.matmul(i_min_cov, points[..., None]).sum(axis=-3)  # (B,D,1)
    a = i_min_cov.sum(axis=-3).astype(jnp.float32)  # (B,D,D)
    # min-norm least squares == pinv solve (reference uses lstsq,
    # geometry_utils.py:276)
    p = jnp.matmul(jnp.linalg.pinv(a), sum_proj.astype(jnp.float32))[..., 0]
    return p.astype(points.dtype), d


def kabsch_rotation(a_n3: jnp.ndarray, b_n3: jnp.ndarray) -> jnp.ndarray:
    """R minimizing ||A - B R||_F (geometry_utils.py:285-305). Batched over
    leading dims via vmap by callers."""
    h = (b_n3.T @ a_n3).astype(jnp.float32)
    u, _, vh = jnp.linalg.svd(h, full_matrices=True)
    s = jnp.linalg.det(u @ vh)
    s_prime = jnp.diag(jnp.array([1.0, 1.0, 0.0], jnp.float32)) + jnp.diag(
        jnp.array([0.0, 0.0, 1.0], jnp.float32)
    ) * jnp.sign(s)
    r = u @ s_prime @ vh
    return r.T


_kabsch_bt = jax.vmap(jax.vmap(kabsch_rotation))


def rq_decomposition_3x3(m: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """M = R @ Q with R upper-triangular (positive diagonal) and Q orthogonal.
    Matches cv2.RQDecomp3x3 up to the positive-diagonal convention
    (geometry_utils.py:448-456). Via flipped QR."""
    p = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], m.dtype)
    q_, r_ = jnp.linalg.qr((p @ m).T)
    r = p @ r_.T @ p
    q = p @ q_.T
    d = jnp.sign(jnp.diagonal(r, axis1=-2, axis2=-1))
    d = jnp.where(d == 0, 1.0, d)
    r = r * d[None, :]
    q = q * d[:, None]
    return r, q


def homography_dlt(src: jnp.ndarray, dst: jnp.ndarray, w: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Least-squares homography via normalized DLT.
    src, dst: (N, 2); w: optional (N,) weights. Returns H (3,3) with
    dst ~ H @ src (homogeneous)."""
    n = src.shape[0]
    if w is None:
        w = jnp.ones((n,), src.dtype)
    wsum = jnp.maximum(w.sum(), 1e-8)

    def normalizer(pts):
        mean = (pts * w[:, None]).sum(0) / wsum
        d = jnp.sqrt(((pts - mean) ** 2).sum(-1))
        meand = (d * w).sum() / wsum
        s = jnp.sqrt(2.0) / jnp.maximum(meand, 1e-12)
        t = jnp.array(
            [[1.0, 0.0, -mean[0]], [0.0, 1.0, -mean[1]], [0.0, 0.0, 1.0]], pts.dtype
        ) * jnp.array([[s], [s], [1.0]], pts.dtype)
        return (pts - mean) * s, t

    s_n, t_s = normalizer(src)
    d_n, t_d = normalizer(dst)

    x, y = s_n[:, 0], s_n[:, 1]
    u, v = d_n[:, 0], d_n[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    row1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    row2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    a = jnp.concatenate([row1, row2], axis=0) * jnp.sqrt(jnp.concatenate([w, w]))[:, None]
    # nullspace = eigenvector of A^T A (9x9) with the smallest eigenvalue —
    # identical to the smallest right singular vector of A, but a fixed 9x9
    # symmetric eigh instead of a (2N, 2N) full-matrices SVD (the refine
    # passes run at N = the full ray grid; the SVD's U factor there is
    # 512x512 of pure waste). Hartley normalization keeps A^T A
    # well-conditioned, so squaring the condition number is harmless in fp32.
    ata = a.T.astype(jnp.float32) @ a.astype(jnp.float32)
    _, vecs = jnp.linalg.eigh(ata)
    h_n = vecs[:, 0].reshape(3, 3)
    h = jnp.linalg.inv(t_d) @ h_n @ t_s
    return h / h[2, 2]


def _homography_transfer_err2(h: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Squared forward transfer error |dst - proj(H src)|^2, per point —
    cv2.findHomography RANSAC's error measure."""
    ones = jnp.ones_like(src[:, :1])
    p = jnp.concatenate([src, ones], axis=-1) @ h.T
    zsafe = jnp.where(jnp.abs(p[:, 2:3]) < 1e-12, 1e-12, p[:, 2:3])
    proj = p[:, :2] / zsafe
    return ((proj - dst) ** 2).sum(-1)


def find_homography_ransac(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    key: jax.Array,
    reproj_threshold: float = 0.2,
    num_trials: int = 128,
    refine_iters: int = 2,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batched fixed-trial RANSAC homography (replaces cv2.findHomography,
    geometry_utils.py:436-441).

    All `num_trials` 4-point hypotheses are solved as one batched SVD, scored
    against all points in parallel, and the best refined by `refine_iters`
    rounds of inlier-weighted DLT. Statistically equivalent to the OpenCV
    path, fully on-device. `valid` excludes points from inlier counts and
    refit weights (static-shape stand-in for the reference's boolean drop);
    minimal samples draw distinct indices (cv2 samples without replacement).
    """
    n = src.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    idx = ransac_sample_indices(key, n, num_trials, 4)
    hs = jax.vmap(lambda i: homography_dlt(src[i], dst[i]))(idx)  # (T,3,3)
    errs = jax.vmap(_homography_transfer_err2, in_axes=(0, None, None))(hs, src, dst)  # (T,N)
    errs = jnp.where(valid[None, :], errs, jnp.inf)
    thr2 = reproj_threshold ** 2
    inliers = errs < thr2
    counts = inliers.sum(-1)
    best = jnp.argmax(counts)
    w = inliers[best].astype(src.dtype)

    for _ in range(refine_iters):
        h = homography_dlt(src, dst, w)
        e = jnp.where(valid, _homography_transfer_err2(h, src, dst), jnp.inf)
        w = (e < thr2).astype(src.dtype)
    return homography_dlt(src, dst, w)


def compute_optimal_rotation_intrinsics(
    rays_origin: jnp.ndarray,
    rays_target: jnp.ndarray,
    key: jax.Array,
    z_threshold: float = 1e-4,
    reproj_threshold: float = 0.2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rotation + intrinsics aligning ray bundles via homography + RQ
    (geometry_utils.py:409-456). rays_origin/target: (N, 3).

    The reference drops points with small |z| (boolean indexing); here those
    points get zero RANSAC weight instead (static shapes).
    Returns (R, K, H)."""
    z_ok = jnp.logical_and(
        jnp.abs(rays_target[:, 2]) > z_threshold, jnp.abs(rays_origin[:, 2]) > z_threshold
    )
    zsafe = lambda z: jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    src = rays_origin[:, :2] / zsafe(rays_origin[:, 2:3])
    dst = rays_target[:, :2] / zsafe(rays_target[:, 2:3])
    # neutralize masked points (zeros) AND exclude them from inlier counting
    # and refit weights — the reference drops them by boolean indexing
    src = jnp.where(z_ok[:, None], src, 0.0)
    dst = jnp.where(z_ok[:, None], dst, 0.0)

    a = find_homography_ransac(src, dst, key, reproj_threshold, valid=z_ok)
    a = jnp.where(jnp.linalg.det(a) < 0, -a, a)
    h = jnp.linalg.inv(a.astype(jnp.float32))  # H = K @ R
    k, r = rq_decomposition_3x3(h)
    k = k / jnp.where(jnp.abs(k[2, 2]) < 1e-12, 1.0, k[2, 2])
    # degenerate input guard: too few usable rays (or a blown-up solve)
    # falls back to identity instead of propagating inf/NaN
    ok = jnp.logical_and(z_ok.sum() >= 4,
                         jnp.logical_and(jnp.all(jnp.isfinite(k)), jnp.all(jnp.isfinite(r))))
    eye = jnp.eye(3, dtype=jnp.float32)
    r = jnp.where(ok, r, eye)
    k = jnp.where(ok, k, eye)
    h = jnp.where(ok, h, eye)
    return r, k, h


def rays_to_cameras(
    camray_b6thw: jnp.ndarray,
    intrinsics_b44t: jnp.ndarray,
    ctr_only: bool = False,
) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """Plucker rays + known (normalized) intrinsics -> extrinsics
    (geometry_utils.py:331-406). The reference's per-(b,t) rotation loop is a
    single batched Kabsch."""
    dtype = intrinsics_b44t.dtype
    camray_b6thw = camray_b6thw.astype(dtype)
    B, _, T, h, w = camray_b6thw.shape

    origins, directions = plucker_to_point_direction(camray_b6thw)
    origins_rs = origins.transpose(0, 2, 3, 4, 1).reshape(-1, h * w, 3)
    directions_rs = directions.transpose(0, 2, 3, 4, 1).reshape(-1, h * w, 3)
    centers, _ = intersect_skew_lines_high_dim(origins_rs, directions_rs)
    centers_bt3 = centers.reshape(B, T, 3)
    if ctr_only:
        return None, centers_bt3

    k33 = denormalize_intrinsics(intrinsics_b44t, h, w)[:, :3, :3]
    pix = _pixel_grid(h, w, dtype)
    rays_d = jnp.einsum("btmn,hwn->bthwm", jnp.linalg.inv(k33.transpose(0, 3, 1, 2)), pix)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    dirs_bthw3 = directions.transpose(0, 2, 3, 4, 1)
    rot_bt33 = _kabsch_bt(rays_d.reshape(B, T, h * w, 3), dirs_bthw3.reshape(B, T, h * w, 3))

    trans_bt3 = -jnp.matmul(rot_bt33, centers_bt3[..., None])[..., 0]
    ext = jnp.zeros((B, T, 4, 4), dtype)
    ext = ext.at[:, :, :3, :3].set(rot_bt33.astype(dtype))
    ext = ext.at[:, :, :3, 3].set(trans_bt3.astype(dtype))
    ext = ext.at[:, :, 3, 3].set(1.0)
    return ext.transpose(0, 2, 3, 1), centers_bt3


def rays_to_cameras_and_fixed_intrinsics(
    camray_b6thw: jnp.ndarray,
    key: jax.Array,
    reproj_threshold: float = 0.2,
    output_size: Tuple[int, int] = (224, 224),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rays -> extrinsics + one shared K estimated from frame 0
    (geometry_utils.py:493-579). Returns (ext (B,4,4,T), centers (B,T,3),
    K (B,4,4,T) scaled to output_size)."""
    B, _, T, h, w = camray_b6thw.shape
    camray = camray_b6thw.astype(jnp.float32)

    origins, directions = plucker_to_point_direction(camray)
    origins_rs = origins.transpose(0, 2, 3, 4, 1).reshape(-1, h * w, 3)
    directions_rs = directions.transpose(0, 2, 3, 4, 1).reshape(-1, h * w, 3)
    centers, _ = intersect_skew_lines_high_dim(origins_rs, directions_rs)
    centers_bt3 = centers.reshape(B, T, 3)

    pix = _pixel_grid(h, w)  # identity-K rays
    ident_rays = pix / jnp.linalg.norm(pix, axis=-1, keepdims=True)  # (h,w,3)
    dirs_bthw3 = directions.transpose(0, 2, 3, 4, 1)

    # frame-0 homography per batch item
    keys = jax.random.split(key, B)

    def solve_k(b_key, dirs_hw3):
        _, k, _ = compute_optimal_rotation_intrinsics(
            ident_rays.reshape(-1, 3), dirs_hw3.reshape(-1, 3), b_key, reproj_threshold=reproj_threshold
        )
        return k

    k_b33 = jax.vmap(solve_k)(keys, dirs_bthw3[:, 0])  # (B,3,3)

    # rays with estimated intrinsics, then batched Kabsch
    rays_d = jnp.einsum("bmn,hwn->bhwm", jnp.linalg.inv(k_b33), pix)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_d_bt = jnp.broadcast_to(rays_d[:, None], (B, T, h, w, 3)).reshape(B, T, h * w, 3)
    rot_bt33 = _kabsch_bt(rays_d_bt, dirs_bthw3.reshape(B, T, h * w, 3))

    trans_bt3 = -jnp.matmul(rot_bt33, centers_bt3[..., None])[..., 0]
    ext = jnp.zeros((B, T, 4, 4), jnp.float32)
    ext = ext.at[:, :, :3, :3].set(rot_bt33)
    ext = ext.at[:, :, :3, 3].set(trans_bt3)
    ext = ext.at[:, :, 3, 3].set(1.0)

    k44 = jnp.zeros((B, 4, 4, T), jnp.float32)
    k44 = k44.at[:, 3, 3].set(1.0)
    k44 = k44.at[:, :3, :3].set(k_b33[..., None])
    hh, ww = output_size
    k44 = denormalize_intrinsics(normalize_intrinsics(k44, h, w), hh, ww)
    return ext.transpose(0, 2, 3, 1), centers_bt3, k44


def rays_to_cameras_and_variable_intrinsics(
    camray_b6thw: jnp.ndarray,
    key: jax.Array,
    reproj_threshold: float = 0.2,
    output_size: Tuple[int, int] = (224, 224),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-frame homography K + R (geometry_utils.py:582-654) — the
    reference's (b,t) double loop vmapped flat."""
    B, _, T, h, w = camray_b6thw.shape
    camray = camray_b6thw.astype(jnp.float32)

    origins, directions = plucker_to_point_direction(camray)
    origins_rs = origins.transpose(0, 2, 3, 4, 1).reshape(-1, h * w, 3)
    directions_rs = directions.transpose(0, 2, 3, 4, 1).reshape(-1, h * w, 3)
    centers, _ = intersect_skew_lines_high_dim(origins_rs, directions_rs)
    centers_bt3 = centers.reshape(B, T, 3)

    pix = _pixel_grid(h, w)
    ident_rays = (pix / jnp.linalg.norm(pix, axis=-1, keepdims=True)).reshape(-1, 3)
    dirs_flat = directions.transpose(0, 2, 3, 4, 1).reshape(B * T, h * w, 3)
    keys = jax.random.split(key, B * T)

    def solve_rt(bt_key, dirs_n3):
        r, k, _ = compute_optimal_rotation_intrinsics(
            ident_rays, dirs_n3, bt_key, reproj_threshold=reproj_threshold
        )
        return r, k

    r_flat, k_flat = jax.vmap(solve_rt)(keys, dirs_flat)
    rot_bt33 = r_flat.reshape(B, T, 3, 3)
    k_bt33 = k_flat.reshape(B, T, 3, 3)

    trans_bt3 = -jnp.matmul(rot_bt33, centers_bt3[..., None])[..., 0]
    ext = jnp.zeros((B, T, 4, 4), jnp.float32)
    ext = ext.at[:, :, :3, :3].set(rot_bt33)
    ext = ext.at[:, :, :3, 3].set(trans_bt3)
    ext = ext.at[:, :, 3, 3].set(1.0)

    k44 = jnp.zeros((B, 4, 4, T), jnp.float32)
    k44 = k44.at[:, 3, 3].set(1.0)
    k44 = k44.at[:, :3, :3].set(k_bt33.transpose(0, 2, 3, 1))
    hh, ww = output_size
    k44 = denormalize_intrinsics(normalize_intrinsics(k44, h, w), hh, ww)
    return ext.transpose(0, 2, 3, 1), centers_bt3, k44
