"""Sliding-window stitching parity vs the reference windowed paths:
dense heads (depth alignment chain, flow frame-0 skip, dyn_mask overwrite)
and the causal tracking scan."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.oracle import reference_path
from l4p_tpu.checkpoint import convert_dpt, convert_track_head, state_dict_to_numpy
from l4p_tpu.models.dpt import DPTConfig
from l4p_tpu.models.l4p import (
    DenseHeadConfig,
    stitch_depth_aligned,
    stitch_overwrite,
    dense_head_raw,
)
from l4p_tpu.models.sam import SamConfig
from l4p_tpu.models.track import TrackConfig, track_forward_windowed

reference_path()

from l4p.models.task_heads.dense_heads import (  # noqa: E402
    VideoMAEDepthDPTHead,
    VideoMAEDynMaskDPTHead,
    VideoMAEFlowDPTHead,
)
from l4p.models.task_heads.sparse_heads import VideoMAETrack2DSamHead  # noqa: E402

# tiny video geometry: window 4 frames, stride 2, T=8 -> 3 windows
IMG = (4, 28, 28)
WS, STRIDE, T_TOTAL = 4, 2, 8
NW = (T_TOTAL - WS) // STRIDE + 1
EMBED = 64
P = (IMG[0] // 2) * (IMG[1] // 14) * (IMG[2] // 14)  # 8 tokens

DPT_SMALL = dict(layer_dims=(256, 512, 1024, 1024), feature_dim=256, last_dim=128, dim_tokens=EMBED)


def run_ref_windowed(head, feats, **kw):
    enc_2dlist = [[torch.from_numpy(f) for f in window] for window in feats]
    strides = torch.arange(0, T_TOTAL - WS + 1, STRIDE)
    with torch.no_grad():
        return head.forward_windowed(
            enc_features_bpc_2dlist=enc_2dlist, img_info=IMG, time_strides=strides,
            intrinsics_b44t=torch.zeros(1, 4, 4, T_TOTAL), **kw,
        )


def make_feats(seed, n_levels=5):
    rng = np.random.default_rng(seed)
    return [
        [rng.standard_normal((1, P, EMBED)).astype(np.float32) for _ in range(n_levels)]
        for _ in range(NW)
    ]


def to_window_feats(feats, hooks):
    """-> list per hook of (nw, B, P, C)"""
    return [jnp.asarray(np.stack([feats[w][h] for w in range(NW)])) for h in hooks]


@pytest.mark.parametrize("kind", ["depth", "flow", "dyn_mask"])
def test_dense_windowed_parity(kind):
    torch.manual_seed(3)
    hooks = [1, 2, 3, 4]
    if kind == "depth":
        ref_head = VideoMAEDepthDPTHead(
            task_name="depth", out_nchan=1, embed_dim=EMBED, depth_fn="exp",
            hooks_idx=hooks, align_window_overlap_fn="inverse",
        )
        hcfg = DenseHeadConfig(
            task_name="depth", kind="depth", out_nchan=1,
            dpt=DPTConfig(num_channels=1, hooks=tuple(hooks), **DPT_SMALL),
        )
        key = "depth_est_b1thw"
    elif kind == "flow":
        ref_head = VideoMAEFlowDPTHead(
            task_name="flow_2d_backward", out_nchan=2, embed_dim=EMBED, hooks_idx=hooks
        )
        hcfg = DenseHeadConfig(
            task_name="flow_2d_backward", kind="flow", out_nchan=2,
            dpt=DPTConfig(num_channels=2, hooks=tuple(hooks), **DPT_SMALL),
        )
        key = "flow_2d_backward_est_b2thw"
    else:
        ref_head = VideoMAEDynMaskDPTHead(
            task_name="dyn_mask", out_nchan=1, embed_dim=EMBED, apply_fn="linear", hooks_idx=hooks
        )
        hcfg = DenseHeadConfig(
            task_name="dyn_mask", kind="dyn_mask", out_nchan=1,
            dpt=DPTConfig(num_channels=1, hooks=tuple(hooks), **DPT_SMALL),
        )
        key = "dyn_mask_est_b1thw"
    ref_head.eval()

    feats = make_feats(0)
    ref_out = run_ref_windowed(ref_head, feats)[key].numpy()

    params = convert_dpt(state_dict_to_numpy(ref_head.state_dict()), hcfg.dpt, prefix="task_head.")
    hook_feats = to_window_feats(feats, hooks)
    w_outs = jnp.stack(
        [
            dense_head_raw(params, hcfg, [hf[w] for hf in hook_feats], IMG)
            for w in range(NW)
        ]
    )
    if kind == "depth":
        ours = stitch_depth_aligned(w_outs, STRIDE, T_TOTAL, hcfg)
    elif kind == "flow":
        ours = stitch_overwrite(w_outs, STRIDE, T_TOTAL, flow_skip=True)
    else:
        ours = stitch_overwrite(w_outs, STRIDE, T_TOTAL)
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=1e-4, atol=1e-4)


def test_track_windowed_parity():
    torch.manual_seed(4)
    head = VideoMAETrack2DSamHead(
        task_name="track_2d", prompt_embed_dim=EMBED, image_size=IMG, patch_size=(2, 14, 14),
        estimate_vis=True, estimate_depth=True, sam_head_depth=2, num_point_embeddings=2,
        modify_pointlabels_for_windowing=True, prompt_using_features=True, attend_to_past=True,
        depth_fn="exp", vis_fn="linear", estimation_directions=[1],
    )
    head.eval()

    rng = np.random.default_rng(5)
    N = 4
    enc_per_window = [rng.standard_normal((1, P, EMBED)).astype(np.float32) for _ in range(NW)]
    # queries at different times incl. one beyond the first window
    qt = np.array([0.5, 1.5, 4.5, 6.5], np.float32)
    qx = rng.uniform(2, 26, N).astype(np.float32)
    qy = rng.uniform(2, 26, N).astype(np.float32)
    queries = np.stack([qt, qx, qy], -1)[None]
    labels = np.ones((1, N), np.float32)

    enc_2dlist = [[torch.from_numpy(enc_per_window[w])] for w in range(NW)]
    strides = torch.arange(0, T_TOTAL - WS + 1, STRIDE)
    with torch.no_grad():
        ref = head.forward_windowed(
            enc_features_bpc_2dlist=enc_2dlist,
            track_2d_pointquerries_bn3=torch.from_numpy(queries.copy()),
            track_2d_pointlabels_bn=torch.from_numpy(labels.copy()),
            time_strides=strides,
        )

    sam_cfg = SamConfig(
        embed_dim=EMBED, image_embedding_size=(2, 2, 2), input_image_size=IMG,
        mlp_dim=2048, num_heads=8,
    )
    cfg = TrackConfig(image_size=IMG, sam=sam_cfg)
    params = convert_track_head(state_dict_to_numpy(head.state_dict()))
    enc_w = jnp.asarray(np.stack(enc_per_window))  # (nw, 1, P, C)
    out = track_forward_windowed(
        params, cfg, enc_w, jnp.asarray(queries), jnp.asarray(labels), window_stride=STRIDE
    )
    # 1e-4 is deliberate: the old 5e-3 masked a real divergence (input
    # queries not yet valid in a window got label 0 instead of the
    # reference's 1, perturbing the attend_to_past memory); with the
    # reference's label overwrite order the error is fp32 noise (~4e-6)
    for k in ["track_2d_traj_est_bn2t", "track_2d_vis_est_bn1t", "track_2d_depth_est_bn1t"]:
        np.testing.assert_allclose(np.asarray(out[k]), ref[k].numpy(), rtol=1e-4, atol=1e-4, err_msg=k)
