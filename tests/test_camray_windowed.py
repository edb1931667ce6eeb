"""Windowed camray parity: our window-0 K-estimation + later-window data-K
path + overwrite stitching vs the reference Traj3DDPTHead.forward_windowed
(cv2 RANSAC inside), with synthetic coherent rays injected in place of the
DPT trunk on both sides."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.oracle import reference_path
from l4p_tpu.geometry.core import get_rays_plucker, normalize_intrinsics
from l4p_tpu.models.dpt import DPTConfig
from l4p_tpu.models.l4p import DenseHeadConfig, camray_windows_to_cameras, stitch_overwrite

reference_path()

from l4p.models.task_heads.dense_heads import VideoMAETraj3DDPTHead  # noqa: E402

T_TOTAL, WS, STRIDE = 8, 4, 2
NW = (T_TOTAL - WS) // STRIDE + 1
H_RAYS = 16
IMG = (WS, 224, 224)


def make_trajectory_rays():
    """Smooth camera trajectory -> per-window Plucker rays at 16x16."""
    rng = np.random.default_rng(0)
    k = np.zeros((1, 4, 4, T_TOTAL), np.float32)
    k[:, 0, 0] = 1.2
    k[:, 1, 1] = 1.1
    k[:, 0, 2] = k[:, 1, 2] = 0.5
    k[:, 2, 2] = k[:, 3, 3] = 1.0
    ext = np.tile(np.eye(4, dtype=np.float32)[None, :, :, None], (1, 1, 1, T_TOTAL))
    for t in range(T_TOTAL):
        ang = 0.03 * t
        ext[0, :3, :3, t] = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]], np.float32
        )
        ext[0, :3, 3, t] = [0.05 * t, 0.01 * t, -0.02 * t]
    rays_full, _ = get_rays_plucker(jnp.asarray(k), jnp.asarray(ext), (H_RAYS, H_RAYS))
    rays_full = np.asarray(rays_full)  # (1,6,T,16,16) in first-frame-relative space
    rays_w = np.stack([rays_full[:, :, s : s + WS] for s in range(0, T_TOTAL - WS + 1, STRIDE)])
    return rays_w, k, ext


class _FixedRaysDPT(torch.nn.Module):
    """Stand-in for the reference head's DPT trunk: returns injected rays."""

    def __init__(self, rays_w):
        super().__init__()
        self.rays_w = rays_w
        self.calls = 0

    def forward(self, feats, img_info):
        out = torch.from_numpy(self.rays_w[self.calls % len(self.rays_w)].copy())
        self.calls += 1
        return out


def test_camray_windowed_fixed_intrinsics_parity():
    rays_w, k_data, ext = make_trajectory_rays()
    # data intrinsics in pixel space (what datasets provide)
    k_px = k_data.copy()
    k_px[:, 0] *= 224
    k_px[:, 1] *= 224
    k_px[:, :2, 2] -= 0.5

    ref_head = VideoMAETraj3DDPTHead(
        task_name="traj3d", hooks_idx=[1, 2, 3, 4], use_intrinsics=False, fixed_intrinsics=True,
        output_size=(WS, H_RAYS, H_RAYS),
    )
    ref_head.task_head = _FixedRaysDPT(rays_w)
    ref_head.eval()
    dummy_feats = [[torch.zeros(1, 1, 1)] * 5 for _ in range(NW)]
    strides = torch.arange(0, T_TOTAL - WS + 1, STRIDE)
    with torch.no_grad():
        ref_out = ref_head.forward_windowed(
            enc_features_bpc_2dlist=dummy_feats, img_info=IMG, time_strides=strides,
            intrinsics_b44t=torch.from_numpy(k_px.copy()),
        )

    hcfg = DenseHeadConfig(
        task_name="traj3d", kind="camray", out_nchan=6,
        dpt=DPTConfig(num_channels=6, output_size=(WS, H_RAYS, H_RAYS)),
        use_intrinsics=False, fixed_intrinsics=True,
    )
    pose_w, intr_w = camray_windows_to_cameras(
        jnp.asarray(rays_w), hcfg, IMG, jnp.asarray(k_px), STRIDE, jax.random.PRNGKey(0)
    )
    ours_pose = np.asarray(stitch_overwrite(pose_w, STRIDE, T_TOTAL))
    ours_k = np.asarray(stitch_overwrite(intr_w, STRIDE, T_TOTAL))

    # NOTE: the reference's standalone forward_windowed drops the intrinsics
    # output (dense_heads.py:114 buffers only the task_est key; intrinsics
    # survive only through joint_windowed_estimation) — ours keeps it, a
    # deliberate superset, so only pose is compared against the oracle.
    ref_pose = ref_out["traj3d_est_b16t"].numpy()

    # RANSAC implementations differ (cv2 vs ours) — on noiseless rays both
    # must recover near-identical cameras
    np.testing.assert_allclose(ours_pose, ref_pose, rtol=0.05, atol=0.05)
    assert ours_k.shape == (1, 16, T_TOTAL)

    # use_intrinsics mode: rotations from the data K; intrinsics echo the RAW
    # input K (the reference emits none standalone and the joint path falls
    # back to the input clone, dense_heads.py:424-426)
    hcfg_ui = DenseHeadConfig(
        task_name="traj3d", kind="camray", out_nchan=6,
        dpt=DPTConfig(num_channels=6, output_size=(WS, H_RAYS, H_RAYS)),
        use_intrinsics=True, fixed_intrinsics=False,
    )
    pose_ui, intr_ui = camray_windows_to_cameras(
        jnp.asarray(rays_w), hcfg_ui, IMG, jnp.asarray(k_px), STRIDE, jax.random.PRNGKey(0)
    )
    k_echo = np.asarray(stitch_overwrite(intr_ui, STRIDE, T_TOTAL)).reshape(1, 4, 4, T_TOTAL)
    np.testing.assert_allclose(k_echo, k_px, rtol=1e-5, atol=1e-5)

    # ground-truth sanity: recovered pose ~= true frame-0-relative pose
    # (rays were built with make_first_cam_ref=True, so pose[t] = E0 @ inv(Et))
    e = ext[0].transpose(2, 0, 1)  # (T,4,4) cam_T_world
    pose_true = (e[0][None] @ np.linalg.inv(e)).transpose(1, 2, 0)  # (4,4,T)
    ours44 = ours_pose.reshape(4, 4, T_TOTAL)
    np.testing.assert_allclose(ours44[:3, :3], pose_true[:3, :3], atol=0.05)
