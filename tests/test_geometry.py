"""Geometry parity vs reference l4p/utils/geometry_utils.py (torch+cv2 CPU)
and recovery tests for the on-device RANSAC solvers."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.oracle import reference_path
from l4p_tpu.geometry import core as gcore
from l4p_tpu.geometry import cameras as gcam
from l4p_tpu.geometry import alignment as galign

reference_path()

import l4p.utils.geometry_utils as ref_geo  # noqa: E402
from l4p.models.aligner import LstSqAffineAligner, LinearAligner  # noqa: E402

RNG = np.random.default_rng(0)


def rand_rotations(n):
    """Random rotation matrices via QR."""
    q, _ = np.linalg.qr(RNG.standard_normal((n, 3, 3)))
    det = np.linalg.det(q)
    q[:, :, 0] *= det[:, None]
    return q.astype(np.float32)


def make_cameras(B, T, h=16, w=16):
    """Synthetic normalized intrinsics + extrinsics (cam_T_world)."""
    K = np.zeros((B, 4, 4, T), np.float32)
    K[:, 0, 0] = RNG.uniform(0.8, 1.5, (B, 1))
    K[:, 1, 1] = RNG.uniform(0.8, 1.5, (B, 1))
    K[:, 0, 2] = 0.5
    K[:, 1, 2] = 0.5
    K[:, 2, 2] = 1.0
    K[:, 3, 3] = 1.0
    R = rand_rotations(B * T).reshape(B, T, 3, 3)
    # keep rotations mild so rays stay forward-facing
    R = 0.9 * np.eye(3, dtype=np.float32) + 0.1 * R
    u, _, vt = np.linalg.svd(R)
    R = (u @ vt).astype(np.float32)
    t = RNG.uniform(-0.5, 0.5, (B, T, 3)).astype(np.float32)
    E = np.zeros((B, T, 4, 4), np.float32)
    E[:, :, :3, :3] = R
    E[:, :, :3, 3] = t
    E[:, :, 3, 3] = 1.0
    return K, E.transpose(0, 2, 3, 1)  # (B,4,4,T)


def test_intrinsics_normalize_roundtrip_parity():
    K, _ = make_cameras(2, 3)
    K_px = K.copy()
    K_px[:, 0] *= 224
    K_px[:, 1] *= 224
    ref = ref_geo.normalize_intrinsics(torch.from_numpy(K_px), 224, 224).numpy()
    ours = np.asarray(gcore.normalize_intrinsics(jnp.asarray(K_px), 224, 224))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)
    ref2 = ref_geo.denormalize_intrinsics(torch.from_numpy(ref), 224, 224).numpy()
    ours2 = np.asarray(gcore.denormalize_intrinsics(jnp.asarray(ours), 224, 224))
    np.testing.assert_allclose(ours2, ref2, rtol=1e-5, atol=1e-5)


def test_point_map_parity():
    B, T, H, W = 2, 3, 12, 16
    K, E = make_cameras(B, T)
    K_px = gcore.denormalize_intrinsics(jnp.asarray(K), H, W)
    depth = RNG.uniform(0.5, 5.0, (B, 1, T, H, W)).astype(np.float32)
    pose = np.linalg.inv(np.asarray(E).transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1).astype(np.float32)
    ref = ref_geo.generate_point_map(
        torch.from_numpy(depth), torch.from_numpy(np.asarray(K_px)), torch.from_numpy(pose)
    ).numpy()
    ours = np.asarray(gcore.generate_point_map(jnp.asarray(depth), K_px, jnp.asarray(pose)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_track_unprojection_parity():
    B, N, T = 2, 5, 4
    K, E = make_cameras(B, T)
    K_px = np.asarray(gcore.denormalize_intrinsics(jnp.asarray(K), 224, 224))
    xy = RNG.uniform(0, 224, (B, N, 2, T)).astype(np.float32)
    z = RNG.uniform(0.5, 4, (B, N, 1, T)).astype(np.float32)
    pose = np.linalg.inv(E.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1).astype(np.float32)
    ref = ref_geo.generate_3d_track_point_map(
        torch.from_numpy(xy), torch.from_numpy(z), torch.from_numpy(K_px), torch.from_numpy(pose)
    ).numpy()
    ours = np.asarray(
        gcore.generate_3d_track_point_map(jnp.asarray(xy), jnp.asarray(z), jnp.asarray(K_px), jnp.asarray(pose))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_rays_plucker_parity():
    B, T = 2, 4
    K, E = make_cameras(B, T)
    for norm_dist in [False, True]:
        ref, ref_s = ref_geo.get_rays_plucker(
            torch.from_numpy(K), torch.from_numpy(E), (16, 16), normalize_dist=norm_dist
        )
        ours, ours_s = gcore.get_rays_plucker(jnp.asarray(K), jnp.asarray(E), (16, 16), normalize_dist=norm_dist)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-4)
        if norm_dist:
            np.testing.assert_allclose(np.asarray(ours_s), ref_s.numpy(), rtol=1e-4, atol=1e-4)


def test_cam_T_ref_and_scale_parity():
    _, E = make_cameras(2, 4)
    ref = ref_geo.get_cam_T_ref(torch.from_numpy(E)).numpy()
    ours = np.asarray(gcore.get_cam_T_ref(jnp.asarray(E)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
    s = RNG.uniform(0.5, 2, (2,)).astype(np.float32)
    ref2 = ref_geo.scale_extrinsics(torch.from_numpy(E), torch.from_numpy(s)).numpy()
    ours2 = np.asarray(gcore.scale_extrinsics(jnp.asarray(E), jnp.asarray(s)))
    np.testing.assert_allclose(ours2, ref2, rtol=1e-5, atol=1e-5)


def test_intersect_skew_lines_parity():
    B, R = 6, 50
    pts = RNG.standard_normal((B, R, 3)).astype(np.float32)
    dirs = RNG.standard_normal((B, R, 3)).astype(np.float32)
    ref_p, _ = ref_geo.intersect_skew_lines_high_dim(torch.from_numpy(pts), torch.from_numpy(dirs))
    ours_p, _ = gcam.intersect_skew_lines_high_dim(jnp.asarray(pts), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(ours_p), ref_p.numpy(), rtol=1e-3, atol=1e-3)


def test_kabsch_parity():
    A = RNG.standard_normal((40, 3)).astype(np.float32)
    B_ = RNG.standard_normal((40, 3)).astype(np.float32)
    ref = ref_geo.compute_optimal_rotation_alignment(torch.from_numpy(A), torch.from_numpy(B_)).numpy()
    ours = np.asarray(gcam.kabsch_rotation(jnp.asarray(A), jnp.asarray(B_)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_rays_to_cameras_parity():
    B, T = 1, 3
    K, E = make_cameras(B, T)
    rays, _ = gcore.get_rays_plucker(jnp.asarray(K), jnp.asarray(E), (16, 16))
    rays_np = np.asarray(rays)
    ref_ext, ref_ctr = ref_geo.rays_to_cameras(
        torch.from_numpy(rays_np), torch.from_numpy(K), ctr_only=False
    )
    ours_ext, ours_ctr = gcam.rays_to_cameras(jnp.asarray(rays_np), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(ours_ctr), ref_ctr.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours_ext), ref_ext.numpy(), rtol=1e-3, atol=2e-3)


def test_rq_decomposition_matches_cv2():
    import cv2

    for i in range(5):
        m = RNG.standard_normal((3, 3)).astype(np.float32)
        if np.linalg.det(m) < 0:
            m = -m
        out = cv2.RQDecomp3x3(m.astype(np.float64))
        k_cv, r_cv = out[1], out[2]
        k, r = gcam.rq_decomposition_3x3(jnp.asarray(m))
        np.testing.assert_allclose(np.asarray(k), k_cv, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(r), r_cv, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(k) @ np.asarray(r), m, rtol=1e-3, atol=1e-3)


def test_homography_recovery_with_outliers():
    h_true = np.array([[1.2, 0.1, 0.05], [-0.08, 0.9, -0.1], [0.02, -0.01, 1.0]], np.float32)
    n = 256
    src = RNG.uniform(-1, 1, (n, 2)).astype(np.float32)
    p = np.concatenate([src, np.ones((n, 1), np.float32)], -1) @ h_true.T
    dst = p[:, :2] / p[:, 2:3]
    # 25% outliers
    out_mask = RNG.uniform(size=n) < 0.25
    dst[out_mask] += RNG.uniform(1, 3, (out_mask.sum(), 2)).astype(np.float32)
    h_est = gcam.find_homography_ransac(
        jnp.asarray(src), jnp.asarray(dst), jax.random.PRNGKey(0), reproj_threshold=0.05
    )
    h_est = np.asarray(h_est) / np.asarray(h_est)[2, 2]
    np.testing.assert_allclose(h_est, h_true / h_true[2, 2], rtol=5e-3, atol=5e-3)


def test_rays_to_cameras_fixed_intrinsics_recovers_K():
    """End-to-end: synthetic rays from known (K, E) -> estimated K/E close to
    truth; also sanity-check against the reference cv2 pipeline output."""
    B, T, h, w = 1, 3, 16, 16
    K, E = make_cameras(B, T)
    rays, _ = gcore.get_rays_plucker(jnp.asarray(K), jnp.asarray(E), (h, w), make_first_cam_ref=True)
    rays_np = np.asarray(rays)

    ext, ctr, k_est = gcam.rays_to_cameras_and_fixed_intrinsics(
        jnp.asarray(rays_np), jax.random.PRNGKey(0), output_size=(224, 224)
    )
    ref_ext, ref_ctr, ref_k = ref_geo.rays_to_cameras_and_intrinsics(
        torch.from_numpy(rays_np), ctr_only=False, reproj_threshold=0.2,
        output_size=(224, 224), fixed_intrinsics=True,
    )
    # both should recover the same K (estimated from identical frame-0 rays)
    np.testing.assert_allclose(np.asarray(k_est), ref_k.numpy(), rtol=0.02, atol=0.05)
    np.testing.assert_allclose(np.asarray(ext), ref_ext.numpy(), rtol=0.02, atol=0.05)
    np.testing.assert_allclose(np.asarray(ctr), ref_ctr.numpy(), rtol=1e-2, atol=1e-2)


def test_lstsq_affine_aligner_parity():
    pred = RNG.uniform(0.5, 5, (2, 1, 4, 8, 8)).astype(np.float32)
    scale, shift = 1.7, 0.3
    target = 1.0 / (scale / pred + shift)  # exact affine-in-disparity relation
    ref = LstSqAffineAligner(pre_post_fn="inverse")
    ref.solve(torch.from_numpy(pred), torch.from_numpy(target), None, None)
    ref_applied = ref.apply(torch.from_numpy(pred)).numpy()
    sol = galign.lstsq_affine_solve(jnp.asarray(pred), jnp.asarray(target), pre_inverse=True)
    ours_applied = np.asarray(galign.lstsq_affine_apply(sol, jnp.asarray(pred), pre_inverse=True))
    np.testing.assert_allclose(np.asarray(sol), ref.sol.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(ours_applied, ref_applied, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(ours_applied, target, rtol=1e-2, atol=1e-2)


def test_linear_aligner_parity():
    pred = RNG.uniform(0.5, 5, (2, 1, 4, 8, 8)).astype(np.float32)
    target = pred * 1.37
    ref = LinearAligner(pre_post_fn=None, method="mean")
    ref.solve(torch.from_numpy(pred), torch.from_numpy(target), None, None)
    ref_applied = ref.apply(torch.from_numpy(pred)).numpy()
    sol = galign.linear_scale_solve(jnp.asarray(pred), jnp.asarray(target))
    ours = np.asarray(galign.linear_scale_apply(sol, jnp.asarray(pred)))
    np.testing.assert_allclose(ours, ref_applied, rtol=1e-4, atol=1e-4)


def test_umeyama_recovers_sim3():
    n = 500
    src = RNG.standard_normal((n, 3)).astype(np.float32)
    R = rand_rotations(1)[0]
    s, t = 1.8, np.array([0.3, -0.2, 1.0], np.float32)
    dst = s * src @ R.T + t
    tf, s_est = galign.umeyama_sim3(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(float(s_est), s, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tf)[:3, :3], s * R, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tf)[:3, 3], t, rtol=1e-3, atol=1e-4)


def test_sim3_ransac_with_outliers():
    n = 2000
    src = RNG.standard_normal((n, 3)).astype(np.float32)
    R = rand_rotations(1)[0]
    s, t = 0.7, np.array([1.0, 0.5, -0.3], np.float32)
    dst = s * src @ R.T + t
    out_mask = RNG.uniform(size=n) < 0.3
    dst[out_mask] += RNG.uniform(0.5, 2, (out_mask.sum(), 3)).astype(np.float32)
    tf, s_est, inl = galign.sim3_ransac(
        jnp.asarray(src), jnp.asarray(dst), jax.random.PRNGKey(1), jnp.asarray(0.05), 10, 128
    )
    np.testing.assert_allclose(float(s_est), s, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(tf)[:3, :3], s * R, rtol=1e-2, atol=1e-2)
    assert np.asarray(inl).sum() > 0.6 * n


def test_sim3_overlap_solve_apply_roundtrip():
    """Full solve/apply on synthetic depth+pose: window pred = scaled/rotated
    version of target; apply should bring pred back onto target."""
    B, T, H, W = 1, 6, 16, 16
    K, E = make_cameras(B, T)
    K_px = np.asarray(gcore.denormalize_intrinsics(jnp.asarray(K), H, W))
    depth_tgt = RNG.uniform(1, 5, (B, 1, T, H, W)).astype(np.float32)
    pose_tgt = np.linalg.inv(E.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1).astype(np.float32)

    # perturb: global Sim(3) on the target world
    Rg = rand_rotations(1)[0]
    sg, tg = 1.5, np.array([0.2, -0.1, 0.4], np.float32)
    Tg = np.eye(4, dtype=np.float32)
    Tg[:3, :3] = sg * Rg
    Tg[:3, 3] = tg
    # pred pose = inv(Tg) @ pose_tgt with rotation part kept orthonormal, depth/ sg
    Tg_inv = np.linalg.inv(Tg)
    pose_pred = np.einsum("ij,bjkt->bikt", Tg_inv, pose_tgt)
    pose_pred[:, :3, :3] *= sg  # de-scale rotation (inverse has 1/sg)
    depth_pred = depth_tgt / sg

    pred = {
        "depth": jnp.asarray(depth_pred),
        "camray": jnp.asarray(pose_pred.reshape(B, 16, T)),
        "camray_intrinsics": jnp.asarray(K_px),
    }
    tgt = {
        "depth": jnp.asarray(depth_tgt),
        "camray": jnp.asarray(pose_tgt.reshape(B, 16, T)),
        "camray_intrinsics": jnp.asarray(K_px),
    }
    rel = galign.sim3_overlap_solve(pred, tgt, jax.random.PRNGKey(0))
    out = galign.sim3_overlap_apply(rel, pred)
    np.testing.assert_allclose(float(rel["s"][0]), sg, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth_tgt, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out["camray"]).reshape(B, 4, 4, T), pose_tgt, rtol=2e-2, atol=2e-2
    )


def test_rotvec_roundtrip_vs_scipy():
    from scipy.spatial.transform import Rotation

    from l4p_tpu.geometry.core import pose_to_rel_pose_b6t, rotmat_to_rotvec, rotvec_to_rotmat

    for i, v in enumerate([[0.1, -0.2, 0.3], [0, 0, 0], [2.0, 1.5, -1.0], [3.14, 0.01, 0.0]]):
        v = np.array(v, np.float32)
        r_sp = Rotation.from_rotvec(v).as_matrix()
        r_j = np.asarray(rotvec_to_rotmat(jnp.asarray(v)))
        np.testing.assert_allclose(r_j, r_sp, rtol=1e-4, atol=1e-5, err_msg=f"case {i}")
        v_back = np.asarray(rotmat_to_rotvec(jnp.asarray(r_sp.astype(np.float32))))
        np.testing.assert_allclose(
            Rotation.from_rotvec(v_back).as_matrix(), r_sp, rtol=1e-3, atol=1e-4, err_msg=f"case {i}"
        )

    # rel_pose_b6t: first frame must map to zeros
    _, E = make_cameras(2, 5)
    pose = np.linalg.inv(E.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1).astype(np.float32)
    rel = np.asarray(pose_to_rel_pose_b6t(jnp.asarray(pose)))
    assert rel.shape == (2, 6, 5)
    np.testing.assert_allclose(rel[:, :, 0], 0, atol=1e-5)


def test_linear_aligner_median_parity():
    pred = RNG.uniform(0.5, 5, (2, 1, 4, 8, 8)).astype(np.float32)
    target = pred * 0.8 + RNG.normal(0, 0.01, pred.shape).astype(np.float32)
    ref = LinearAligner(pre_post_fn="inverse", method="median")
    ref.solve(torch.from_numpy(pred), torch.from_numpy(target), None, None)
    ref_applied = ref.apply(torch.from_numpy(pred)).numpy()
    sol = galign.linear_scale_solve(jnp.asarray(pred), jnp.asarray(target), pre_inverse=True, method="median")
    ours = np.asarray(galign.linear_scale_apply(sol, jnp.asarray(pred), pre_inverse=True))
    np.testing.assert_allclose(ours, ref_applied, rtol=1e-3, atol=1e-3)


def test_ransac_sample_indices_distinct_when_k_not_dividing_n():
    """Minimal samples must never repeat a point, even when k does not
    divide n (a sample cut across a permutation boundary could repeat one
    -> rank-deficient DLT wasting the hypothesis)."""
    import jax
    import numpy as np

    from l4p_tpu.geometry.core import ransac_sample_indices

    for n, trials, k in [(255, 128, 4), (253, 128, 10), (16, 40, 4)]:
        idx = np.asarray(ransac_sample_indices(jax.random.PRNGKey(3), n, trials, k))
        assert idx.shape == (trials, k)
        assert idx.min() >= 0 and idx.max() < n
        n_unique = np.array([len(set(row)) for row in idx])
        assert (n_unique == k).all(), f"duplicate index inside a minimal sample (n={n})"
