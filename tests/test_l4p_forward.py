"""End-to-end orchestrator smoke + structural tests (tiny model)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from l4p_tpu.config import init_l4p_params, load_model_config
from l4p_tpu.models.dpt import DPTConfig
from l4p_tpu.models.encoder import EncoderConfig
from l4p_tpu.models.l4p import DenseHeadConfig, L4PConfig, l4p_forward, l4p_forward_single_window
from l4p_tpu.models.sam import SamConfig
from l4p_tpu.models.track import TrackConfig

TINY_ENC = EncoderConfig(img_size=28, patch_size=14, embed_dim=64, depth=4, num_heads=4, all_frames=4)
HOOKS = (1, 2, 3, 4)
TINY_DPT = dict(layer_dims=(8, 8, 16, 16), feature_dim=8, last_dim=8, dim_tokens=64)


def tiny_cfg():
    heads = (
        ("flow_2d_backward", DenseHeadConfig(
            task_name="flow_2d_backward", kind="flow", out_nchan=2,
            dpt=DPTConfig(num_channels=2, hooks=HOOKS, **TINY_DPT))),
        ("depth", DenseHeadConfig(
            task_name="depth", kind="depth", out_nchan=1,
            dpt=DPTConfig(num_channels=1, hooks=HOOKS, **TINY_DPT))),
        ("dyn_mask", DenseHeadConfig(
            task_name="dyn_mask", kind="dyn_mask", out_nchan=1,
            dpt=DPTConfig(num_channels=1, hooks=HOOKS, **TINY_DPT))),
        ("camray", DenseHeadConfig(
            task_name="traj3d", kind="camray", out_nchan=6,
            dpt=DPTConfig(num_channels=6, hooks=HOOKS,
                          actpost_scale_factors=((1, 0, 0), (1, 0, 0), (0, 0, 0), (-1, -1, -1)),
                          fusion_scale_factors=((1, 1, 1), (1, 1, 1), (2, 1, 1), (2, 2, 2)),
                          output_size=(4, 2, 2), **TINY_DPT))),
    )
    track = TrackConfig(
        image_size=(4, 28, 28),
        sam=SamConfig(embed_dim=64, image_embedding_size=(2, 2, 2), input_image_size=(4, 28, 28)),
        max_queries=8,
    )
    return L4PConfig(
        encoder=TINY_ENC, window_size=(4, 28, 28), window_stride_t=2,
        joint_alignment=True, heads=heads, track=track,
        sim3_num_trials=16, sim3_min_samples=5,
    )


def make_data(T=8, N=5, with_tracks=True, seed=0):
    rng = np.random.default_rng(seed)
    data = {
        "rgb_b3thw": jnp.asarray(rng.standard_normal((1, 3, T, 28, 28)).astype(np.float32)),
        "intrinsics_b44t": jnp.asarray(
            np.tile(np.diag([30.0, 30.0, 1, 1]).astype(np.float32)[None, :, :, None], (1, 1, 1, T))
        ).at[:, 0, 2].set(14.0).at[:, 1, 2].set(14.0),
    }
    if with_tracks:
        q = np.stack(
            [rng.uniform(0, T, N), rng.uniform(0, 28, N), rng.uniform(0, 28, N)], -1
        ).astype(np.float32)
        data["track_2d_pointquerries_bn3"] = jnp.asarray(q[None])
        data["track_2d_pointlabels_bn"] = jnp.ones((1, N), jnp.float32)
    return data


ALL_TASKS = ("flow_2d_backward", "track_2d", "depth", "dyn_mask", "camray")


def test_all_task_forward_shapes():
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    data = make_data(T=8, N=5)
    out = jax.jit(
        lambda p, d: l4p_forward(p, cfg, d, ALL_TASKS), static_argnames=()
    )(params, data)
    T = 8
    assert out["flow_2d_backward_est_b2thw"].shape == (1, 2, T, 28, 28)
    assert out["depth_est_b1thw"].shape == (1, 1, T, 28, 28)
    assert out["dyn_mask_est_b1thw"].shape == (1, 1, T, 28, 28)
    assert out["traj3d_est_b16t"].shape == (1, 16, T)
    assert out["traj3d_intrinsics_est_b16t"].shape == (1, 16, T)
    assert out["track_2d_traj_est_bn2t"].shape == (1, 5, 2, T)
    assert out["track_2d_vis_est_bn1t"].shape == (1, 5, 1, T)
    assert out["track_2d_depth_est_bn1t"].shape == (1, 5, 1, T)
    for k, v in out.items():
        assert np.all(np.isfinite(np.asarray(v))), f"non-finite values in {k}"
    # depth must be positive (exp activation)
    assert np.all(np.asarray(out["depth_est_b1thw"]) > 0)
    # stitched pose rows: bottom row of each 4x4 pose must be (0,0,0,1)
    pose = np.asarray(out["traj3d_est_b16t"]).reshape(1, 4, 4, T)
    np.testing.assert_allclose(pose[:, 3, :3], 0, atol=1e-5)
    np.testing.assert_allclose(pose[:, 3, 3], 1, atol=1e-5)


def test_uint8_ingest_full_forward_matches_float():
    """l4p_forward(rgb_u8_bthw3) == l4p_forward(rgb_b3thw) on a uint8-exact
    video, end to end across all tasks (windowing, stitching, tracking)."""
    from l4p_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 255, (1, 8, 28, 28, 3), np.uint8)
    x = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    data = make_data(T=8, N=5)
    data_f = dict(data)
    data_f["rgb_b3thw"] = jnp.asarray(x.transpose(0, 4, 1, 2, 3))
    data_u = {k: v for k, v in data.items() if k != "rgb_b3thw"}
    data_u["rgb_u8_bthw3"] = jnp.asarray(u8)

    out_f = l4p_forward(params, cfg, data_f, ALL_TASKS, key=jax.random.PRNGKey(0))
    out_u = l4p_forward(params, cfg, data_u, ALL_TASKS, key=jax.random.PRNGKey(0))
    assert set(out_f) == set(out_u)
    for k in out_f:
        np.testing.assert_allclose(
            np.asarray(out_u[k], np.float32), np.asarray(out_f[k], np.float32),
            rtol=2e-2, atol=2e-2, err_msg=k,
        )


def test_query_chunking_consistency():
    """max_queries chunking must not change results (reference
    sparse_heads.py:181-211)."""
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    data = make_data(T=8, N=6)
    out_big = l4p_forward(params, cfg, data, ("track_2d",))
    cfg_small = dataclasses.replace(cfg, track=dataclasses.replace(cfg.track, max_queries=2))
    out_small = l4p_forward(params, cfg_small, data, ("track_2d",))
    np.testing.assert_allclose(
        np.asarray(out_big["track_2d_traj_est_bn2t"]),
        np.asarray(out_small["track_2d_traj_est_bn2t"]),
        rtol=1e-4, atol=1e-4,
    )


def test_depth_standalone_vs_joint_differ_only_by_alignment():
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    data = make_data(T=8, with_tracks=False)
    out_joint = l4p_forward(params, cfg, data, ("depth", "camray"))
    cfg_nj = dataclasses.replace(cfg, joint_alignment=False)
    out_sep = l4p_forward(params, cfg_nj, data, ("depth", "camray"))
    # first window is the anchor in both cases -> identical there
    np.testing.assert_allclose(
        np.asarray(out_joint["depth_est_b1thw"][:, :, :2]),
        np.asarray(out_sep["depth_est_b1thw"][:, :, :2]),
        rtol=1e-4, atol=1e-4,
    )


def test_single_window_forward():
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    data = make_data(T=4, N=3)
    out = l4p_forward_single_window(params, cfg, data, ALL_TASKS)
    assert out["depth_est_b1thw"].shape == (1, 1, 4, 28, 28)
    assert out["track_2d_traj_est_bn2t"].shape == (1, 3, 2, 4)
    assert out["traj3d_est_b16t"].shape == (1, 16, 4)


def test_yaml_config_roundtrip():
    cfg, tasks = load_model_config("configs/model.yaml")
    assert tasks == ("flow_2d_backward", "track_2d", "depth", "dyn_mask", "camray")
    heads = cfg.head_dict
    assert heads["depth"].depth_fn == "exp" and heads["depth"].align_pre_inverse
    assert heads["camray"].fixed_intrinsics and not heads["camray"].use_intrinsics
    assert heads["camray"].dpt.output_size == (16, 16, 16)
    assert cfg.joint_alignment
    assert cfg.track.prompt_using_features and cfg.track.attend_to_past
    assert cfg.track.sam.num_mask_tokens == 3
    assert cfg.all_hooks == (14, 21, 28, 36)


def test_batched_inference_per_item_equivalence():
    """B>1 all-task inference (the reference hard-asserts B==1 in tracking
    and 4D vis, sparse_heads.py:241, vis.py:118 — here batch is a real axis
    end-to-end): item 0 of a B=2 run equals the B=1 run of item 0, through
    the joint Sim(3) path and the causal tracking scan."""
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    T, N, B = 8, 4, 2
    k = np.tile(np.diag([30.0, 30.0, 1, 1]).astype(np.float32)[None, :, :, None], (B, 1, 1, T))
    k[:, 0, 2] = 14.0
    k[:, 1, 2] = 14.0
    q = np.stack(
        [rng.uniform(0, T, (B, N)), rng.uniform(0, 28, (B, N)), rng.uniform(0, 28, (B, N))], -1
    ).astype(np.float32)
    data = {
        "rgb_b3thw": jnp.asarray(rng.standard_normal((B, 3, T, 28, 28)), jnp.float32),
        "intrinsics_b44t": jnp.asarray(k),
        "track_2d_pointquerries_bn3": jnp.asarray(q),
        "track_2d_pointlabels_bn": jnp.ones((B, N), jnp.float32),
    }
    out = jax.jit(lambda p, d: l4p_forward(p, cfg, d, ALL_TASKS))(params, data)
    d0 = {k2: v[:1] for k2, v in data.items()}
    out0 = jax.jit(lambda p, d: l4p_forward(p, cfg, d, ALL_TASKS))(params, d0)
    for k2 in out:
        assert out[k2].shape[0] == B
        np.testing.assert_allclose(
            np.asarray(out[k2][:1], np.float32), np.asarray(out0[k2], np.float32),
            rtol=1e-4, atol=1e-4, err_msg=k2,
        )
