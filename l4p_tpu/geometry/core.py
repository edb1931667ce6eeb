"""Core camera geometry: intrinsics, point maps, Plucker rays.

TPU-native re-design of reference l4p/utils/geometry_utils.py:13-241 —
identical math, vectorized einsums, functional-style `.at[]` updates instead
of in-place mutation. fp32 throughout (the reference forces fp32 at these
spots too, e.g. geometry_utils.py:43).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def ransac_sample_indices(key: jax.Array, n: int, num_trials: int, k: int) -> jnp.ndarray:
    """(num_trials, k) point indices, distinct WITHIN each minimal sample.

    Uniform without-replacement draws per trial, built from chopped
    permutations: a per-trial `choice(replace=False)` lowers to one full
    n-element sort PER TRIAL (128 sorts of ~15k points per Sim(3) window
    transition); chopping permutations costs one sort each. Samples are cut
    WITHIN one permutation only — rows never straddle a permutation boundary,
    which would let a point repeat inside a sample when k does not divide n
    (a rank-deficient solve wasting that hypothesis). Shared by sim3_ransac
    and find_homography_ransac."""
    per = n // k  # full samples per permutation
    assert per >= 1, f"need at least {k} points, got {n}"
    n_perms = -(-num_trials // per)  # python ceil: static under jit
    keys = jax.random.split(key, n_perms)
    rows = jnp.concatenate(
        [jax.random.permutation(kk, n)[: per * k].reshape(per, k) for kk in keys]
    )
    return rows[:num_trials]


def normalize_intrinsics(intrinsics_b44t: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[0,1]-normalized K with half-pixel offset (geometry_utils.py:110-116)."""
    k = intrinsics_b44t
    k = k.at[:, :2, 2].add(0.5)
    k = k.at[:, 0].divide(w)
    k = k.at[:, 1].divide(h)
    return k


def denormalize_intrinsics(intrinsics_b44t: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Inverse of normalize_intrinsics (geometry_utils.py:119-125)."""
    k = intrinsics_b44t
    k = k.at[:, 0].multiply(w)
    k = k.at[:, 1].multiply(h)
    k = k.at[:, :2, 2].add(-0.5)
    return k


def _pixel_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Homogeneous pixel grid (h, w, 3) with (x=i, y=j, 1) ordering."""
    j, i = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij")
    return jnp.stack([i, j, jnp.ones_like(i)], axis=-1)


def generate_point_map(
    depth_b1thw: jnp.ndarray,
    intrinsics_b44t: jnp.ndarray,
    world_T_cam_b44t: jnp.ndarray,
) -> jnp.ndarray:
    """Unproject depth into world points (geometry_utils.py:13-53).
    Returns (B, 3, T, H, W)."""
    B, _, T, H, W = depth_b1thw.shape
    k33 = intrinsics_b44t[:, :3, :3].astype(jnp.float32)  # (B,3,3,T)
    k_inv = jnp.linalg.inv(k33.transpose(0, 3, 1, 2))  # (B,T,3,3)
    pix = _pixel_grid(H, W)  # (H,W,3)
    rays = jnp.einsum("btmn,hwn->bmthw", k_inv, pix)
    pts = rays * depth_b1thw.astype(jnp.float32)
    pts_h = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=1)
    out = jnp.einsum("bmnt,bnthw->bmthw", world_T_cam_b44t.astype(jnp.float32), pts_h)
    return out[:, :3].astype(depth_b1thw.dtype)


def unproject_2d_track_to_3d(
    track_xy_bn2t: jnp.ndarray, track_z_bn1t: jnp.ndarray, intrinsics_b44t: jnp.ndarray
) -> jnp.ndarray:
    """2D track + depth -> camera XYZ (geometry_utils.py:56-81)."""
    fx = intrinsics_b44t[:, 0:1, 0:1, :]
    fy = intrinsics_b44t[:, 1:2, 1:2, :]
    cx = intrinsics_b44t[:, 0:1, 2:3, :]
    cy = intrinsics_b44t[:, 1:2, 2:3, :]
    x = (track_xy_bn2t[:, :, 0:1, :] - cx) * track_z_bn1t / fx
    y = (track_xy_bn2t[:, :, 1:2, :] - cy) * track_z_bn1t / fy
    return jnp.concatenate([x, y, track_z_bn1t], axis=-2)


def generate_3d_track_point_map(
    track_2d_traj_bn2t: jnp.ndarray,
    track_2d_depth_bn1t: jnp.ndarray,
    intrinsics_b44t: jnp.ndarray,
    world_T_cam_b44t: jnp.ndarray,
) -> jnp.ndarray:
    """2D track -> world XYZ (geometry_utils.py:84-107)."""
    xyz_bn3t = unproject_2d_track_to_3d(track_2d_traj_bn2t, track_2d_depth_bn1t, intrinsics_b44t)
    xyz_b3tn = xyz_bn3t.transpose(0, 2, 3, 1)
    xyz_b4tn = jnp.concatenate([xyz_b3tn, jnp.ones_like(xyz_b3tn[:, :1])], axis=1)
    xyz_b4tn = jnp.einsum("bmnt,bntp->bmtp", world_T_cam_b44t, xyz_b4tn)
    return xyz_b4tn[:, :3].transpose(0, 3, 1, 2)


def rotmat_to_quat(r_33: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), numerically stable
    via the largest-denominator branch (Shepperd's method, branchless)."""
    r = r_33.astype(jnp.float32)
    m00, m11, m22 = r[0, 0], r[1, 1], r[2, 2]
    # 4*q_i^2 candidates for i in (w, x, y, z)
    cand = jnp.stack([1 + m00 + m11 + m22, 1 + m00 - m11 - m22,
                      1 - m00 + m11 - m22, 1 - m00 - m11 + m22])
    i = jnp.argmax(cand)
    s = 2.0 * jnp.sqrt(jnp.maximum(cand[i], 1e-12))

    def q_w():
        return jnp.stack([s / 4, (r[2, 1] - r[1, 2]) / s, (r[0, 2] - r[2, 0]) / s, (r[1, 0] - r[0, 1]) / s])

    def q_x():
        return jnp.stack([(r[2, 1] - r[1, 2]) / s, s / 4, (r[0, 1] + r[1, 0]) / s, (r[0, 2] + r[2, 0]) / s])

    def q_y():
        return jnp.stack([(r[0, 2] - r[2, 0]) / s, (r[0, 1] + r[1, 0]) / s, s / 4, (r[1, 2] + r[2, 1]) / s])

    def q_z():
        return jnp.stack([(r[1, 0] - r[0, 1]) / s, (r[0, 2] + r[2, 0]) / s, (r[1, 2] + r[2, 1]) / s, s / 4])

    q = jax.lax.switch(i, [q_w, q_x, q_y, q_z])
    q = q * jnp.sign(jnp.where(q[0] == 0, 1.0, q[0]))  # canonical w >= 0
    return q / jnp.linalg.norm(q)


def rotmat_to_rotvec(r_33: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> axis-angle vector (for the rel_pose_b6t schema's
    xyz+rotvec encoding, l4p_dataset_mini.py:27)."""
    q = rotmat_to_quat(r_33)
    w, xyz = q[0], q[1:]
    n = jnp.linalg.norm(xyz)
    angle = 2.0 * jnp.arctan2(n, w)
    axis = xyz / jnp.where(n < 1e-12, 1.0, n)
    # tiny angle: rotvec ~= 2*xyz (first order)
    return jnp.where(n < 1e-12, 2.0 * xyz, axis * angle)


def rotvec_to_rotmat(v_3: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vector -> rotation matrix (Rodrigues)."""
    v = v_3.astype(jnp.float32)
    angle = jnp.linalg.norm(v)
    safe = jnp.where(angle < 1e-12, 1.0, angle)
    k = v / safe
    kx = jnp.array([[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]], jnp.float32)
    r = jnp.eye(3) + jnp.sin(angle) * kx + (1 - jnp.cos(angle)) * (kx @ kx)
    vx = jnp.array([[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]], jnp.float32)
    return jnp.where(angle < 1e-12, jnp.eye(3) + vx, r)  # first-order for tiny angles


def pose_to_rel_pose_b6t(world_T_cam_b44t: jnp.ndarray) -> jnp.ndarray:
    """Poses -> first-frame-relative xyz+rotvec (the rel_pose_b6t schema)."""
    b = world_T_cam_b44t.shape[0]
    t = world_T_cam_b44t.shape[-1]
    pose = world_T_cam_b44t.transpose(0, 3, 1, 2).astype(jnp.float32)  # (B,T,4,4)
    rel = jnp.matmul(jnp.linalg.inv(pose[:, :1]), pose)  # frame-0 relative
    rv = jax.vmap(jax.vmap(lambda m: rotmat_to_rotvec(m[:3, :3])))(rel)
    xyz = rel[:, :, :3, 3]
    return jnp.concatenate([xyz, rv], axis=-1).transpose(0, 2, 1)  # (B,6,T)


def get_cam_T_ref(cam_T_world_b44t: jnp.ndarray, ref_idx: int = 0) -> jnp.ndarray:
    """Poses relative to the reference frame (geometry_utils.py:128-143)."""
    cam_T_world = cam_T_world_b44t.transpose(0, 3, 1, 2)
    world_T_ref = jnp.linalg.inv(cam_T_world[:, ref_idx : ref_idx + 1])
    cam_T_ref = jnp.matmul(cam_T_world, world_T_ref)
    return cam_T_ref.transpose(0, 2, 3, 1)


def scale_extrinsics(extrinsics_b44t: jnp.ndarray, scale_b1: jnp.ndarray) -> jnp.ndarray:
    """Scale translation only (geometry_utils.py:146-150)."""
    return extrinsics_b44t.at[:, :3, 3].multiply(scale_b1[:, None, None])


def scale_rays_plucker(camray_b6thw: jnp.ndarray, scale_b1: jnp.ndarray) -> jnp.ndarray:
    """Scale Plucker moments (geometry_utils.py:158-162). scale: (B,)."""
    s = scale_b1.reshape(-1, 1, 1, 1, 1)  # broadcast over (3,T,H,W), not W
    return camray_b6thw.at[:, 3:].multiply(s)


def get_rays_plucker(
    intrinsics_b44t: jnp.ndarray,
    extrinsics_b44t: jnp.ndarray,
    emb_hw: Tuple[int, int],
    make_first_cam_ref: bool = True,
    normalize_dist: bool = False,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Per-pixel Plucker rays of a camera trajectory
    (geometry_utils.py:165-241). intrinsics are normalized; extrinsics are
    cam_T_world. Returns (camray (B,6,T,h,w), scale (B,) or None)."""
    h, w = emb_hw
    B, _, _, T = intrinsics_b44t.shape
    dtype = intrinsics_b44t.dtype

    cam_T_world = extrinsics_b44t.transpose(0, 3, 1, 2)  # (B,T,4,4)
    world_T_cam = jnp.linalg.inv(cam_T_world)
    if make_first_cam_ref:
        ref_T_cam = jnp.matmul(cam_T_world[:, :1], world_T_cam)
    else:
        ref_T_cam = world_T_cam

    if normalize_dist:
        dist = jnp.linalg.norm(ref_T_cam[:, 1, :3, -1], axis=1)
        dist = jnp.where(dist < eps, 1.0, dist)
        scale = 1.0 / dist
    else:
        scale = None

    k33 = denormalize_intrinsics(intrinsics_b44t, h, w)[:, :3, :3]
    pix = _pixel_grid(h, w, dtype)  # (h,w,3)
    rays_d = jnp.einsum("btmn,hwn->bthwm", jnp.linalg.inv(k33.transpose(0, 3, 1, 2)), pix)
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_d = jnp.einsum("btmn,bthwn->bthwm", ref_T_cam[..., :3, :3], rays_d)

    rays_o = ref_T_cam[..., :3, 3]  # (B,T,3)
    if normalize_dist:
        rays_o = rays_o * scale[:, None, None]
    rays_oxd = jnp.cross(jnp.broadcast_to(rays_o[:, :, None, None, :], rays_d.shape), rays_d, axis=-1)
    plucker = jnp.concatenate([rays_d, rays_oxd], axis=-1)
    return plucker.transpose(0, 4, 1, 2, 3), scale


def plucker_to_point_direction(
    camray_b6thw: jnp.ndarray, normalize_moment: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plucker -> (closest point, direction) (geometry_utils.py:308-328)."""
    direction = camray_b6thw[:, :3]
    moment = camray_b6thw[:, 3:]
    if normalize_moment:
        c = jnp.linalg.norm(direction, axis=1, keepdims=True)
        moment = moment / c
    points = jnp.cross(direction, moment, axis=1)
    return points, direction
