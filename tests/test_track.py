"""Golden parity: tracking head single-window forward vs reference
VideoMAETrack2DSamHead (full-size modules, tiny token counts)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.oracle import reference_path
from l4p_tpu.checkpoint import convert_track_head, state_dict_to_numpy
from l4p_tpu.models.sam import SamConfig
from l4p_tpu.models.track import TrackConfig, track_forward

reference_path()

from l4p.models.task_heads.sparse_heads import VideoMAETrack2DSamHead  # noqa: E402

# small config: embed 64, video (4, 28, 28) -> tokens (2, 2, 2) = 8
SAM_SMALL = SamConfig(
    embed_dim=64,
    image_embedding_size=(2, 2, 2),
    input_image_size=(4, 28, 28),
    mlp_dim=128,
    num_heads=8,
    decoding_out_dim_factor=8,
)
CFG_SMALL = TrackConfig(image_size=(4, 28, 28), sam=SAM_SMALL)


def make_ref_head(seed=0):
    torch.manual_seed(seed)
    head = VideoMAETrack2DSamHead(
        task_name="track_2d",
        prompt_embed_dim=64,
        image_size=(4, 28, 28),
        patch_size=(2, 14, 14),
        estimate_vis=True,
        estimate_depth=True,
        sam_head_depth=2,
        num_point_embeddings=2,
        modify_pointlabels_for_windowing=True,
        prompt_using_features=True,
        attend_to_past=True,
        depth_fn="exp",
        vis_fn="linear",
        estimation_directions=[1],
    )
    # patch the tiny mlp_dim: rebuild transformer deterministic
    head.eval()
    return head


def test_track_forward_parity():
    head = make_ref_head()
    rng = np.random.default_rng(0)
    B, N, P, C = 1, 3, 8, 64
    enc = rng.standard_normal((B, P, C)).astype(np.float32)
    queries = np.stack(
        [rng.uniform(0, 4, N), rng.uniform(0, 28, N), rng.uniform(0, 28, N)], axis=-1
    ).astype(np.float32)[None]
    labels = np.ones((B, N), np.float32)
    prompt_feats = rng.standard_normal((B, N, C)).astype(np.float32)
    prompt_labels = np.ones((B, N), np.float32)

    with torch.no_grad():
        ref = head.forward(
            enc_features_bpc_list=[torch.from_numpy(enc)],
            track_2d_pointquerries_bn3=torch.from_numpy(queries),
            track_2d_pointlabels_bn=torch.from_numpy(labels),
            track_2d_promptfeatures_bnc=torch.from_numpy(prompt_feats),
            track_2d_promptfeaturelabels_bn=torch.from_numpy(prompt_labels),
        )

    sam_cfg = SamConfig(
        embed_dim=64, image_embedding_size=(2, 2, 2), input_image_size=(4, 28, 28),
        mlp_dim=2048, num_heads=8,
    )
    cfg = TrackConfig(image_size=(4, 28, 28), sam=sam_cfg)
    params = convert_track_head(state_dict_to_numpy(head.state_dict()))
    out = track_forward(
        params, cfg, jnp.asarray(enc), jnp.asarray(queries), jnp.asarray(labels),
        jnp.asarray(prompt_feats), jnp.asarray(prompt_labels),
    )

    for key in [
        "track_2d_traj_est_bn2t",
        "track_2d_vis_est_bn1t",
        "track_2d_depth_est_bn1t",
        "track_2d_prompt_features_bnc",
    ]:
        np.testing.assert_allclose(
            np.asarray(out[key]), ref[key].numpy(), rtol=1e-4, atol=1e-4, err_msg=key
        )
    # we project only the kept (last te/2 tubelet-step) slice of the token
    # memory — the projection is per-token, so it must equal the same slice
    # of the reference's full projected memory (sparse_heads.py:388-393)
    te, he, we = sam_cfg.image_embedding_size
    ref_hist = ref["track_2d_enc_features_with_track_history_bnpc"].numpy()
    B_, N_, P_, C_ = ref_hist.shape
    ref_kept = ref_hist.reshape(B_, N_, te, he * we, C_)[:, :, te // 2 :].reshape(
        B_, N_, P_ // 2, C_
    )
    np.testing.assert_allclose(
        np.asarray(out["track_2d_enc_history_kept_bnpc"]), ref_kept,
        rtol=1e-4, atol=1e-4, err_msg="kept token memory",
    )


def test_track_forward_label_variants():
    """Labels -1/0/1/2 and missing prompt features take distinct paths."""
    head = make_ref_head()
    rng = np.random.default_rng(1)
    B, N, P, C = 1, 4, 8, 64
    enc = rng.standard_normal((B, P, C)).astype(np.float32)
    queries = np.stack(
        [rng.uniform(0, 4, N), rng.uniform(0, 28, N), rng.uniform(0, 28, N)], axis=-1
    ).astype(np.float32)[None]
    labels = np.array([[0.0, 1.0, 2.0, 1.0]], np.float32)

    with torch.no_grad():
        ref = head.forward(
            enc_features_bpc_list=[torch.from_numpy(enc)],
            track_2d_pointquerries_bn3=torch.from_numpy(queries),
            track_2d_pointlabels_bn=torch.from_numpy(labels),
        )
    sam_cfg = SamConfig(
        embed_dim=64, image_embedding_size=(2, 2, 2), input_image_size=(4, 28, 28),
        mlp_dim=2048, num_heads=8,
    )
    cfg = TrackConfig(image_size=(4, 28, 28), sam=sam_cfg)
    params = convert_track_head(state_dict_to_numpy(head.state_dict()))
    out = track_forward(params, cfg, jnp.asarray(enc), jnp.asarray(queries), jnp.asarray(labels))
    np.testing.assert_allclose(
        np.asarray(out["track_2d_traj_est_bn2t"]),
        ref["track_2d_traj_est_bn2t"].numpy(),
        rtol=1e-4,
        atol=1e-4,
    )


def test_track_forward_per_query_features():
    """attend_to_past path: per-query (B, N, P, C) encoder tokens."""
    head = make_ref_head()
    rng = np.random.default_rng(2)
    B, N, P, C = 1, 3, 8, 64
    enc = rng.standard_normal((B, N, P, C)).astype(np.float32)
    queries = np.stack(
        [rng.uniform(0, 4, N), rng.uniform(0, 28, N), rng.uniform(0, 28, N)], axis=-1
    ).astype(np.float32)[None]
    labels = np.ones((B, N), np.float32)
    with torch.no_grad():
        ref = head.forward(
            enc_features_bpc_list=[torch.from_numpy(enc)],
            track_2d_pointquerries_bn3=torch.from_numpy(queries),
            track_2d_pointlabels_bn=torch.from_numpy(labels),
        )
    sam_cfg = SamConfig(
        embed_dim=64, image_embedding_size=(2, 2, 2), input_image_size=(4, 28, 28),
        mlp_dim=2048, num_heads=8,
    )
    cfg = TrackConfig(image_size=(4, 28, 28), sam=sam_cfg)
    params = convert_track_head(state_dict_to_numpy(head.state_dict()))
    out = track_forward(params, cfg, jnp.asarray(enc), jnp.asarray(queries), jnp.asarray(labels))
    np.testing.assert_allclose(
        np.asarray(out["track_2d_traj_est_bn2t"]),
        ref["track_2d_traj_est_bn2t"].numpy(),
        rtol=1e-4,
        atol=1e-4,
    )
