"""Strict checkpoint conversion (reference load_state_dict strict=True,
l4p/models/utils.py:52-53): convert_l4p must consume every checkpoint key
and find every key the config requires — mismatches raise instead of
degrading silently. Exercised on a tiny REAL reference module tree
(torch heads + encoder from /root/reference, tiny dims)."""

import dataclasses

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.oracle import reference_path
from l4p_tpu.config import convert_l4p, load_model_config

reference_path()

from l4p.models.l4p_videomae import VideoMAEEncoder  # noqa: E402
from l4p.models.task_heads.dpt.dust3r.dpt_head import PixelwiseTaskWithDPT  # noqa: E402
from l4p.models.task_heads.sparse_heads import VideoMAETrack2DSamHead  # noqa: E402


def _tiny_dpt(num_channels, actpost, fusion, output_size=None):
    """Tiny trunk at model_tiny.yaml dims. The dense-head wrappers register
    ONLY self.task_head (dense_heads.py:52-64 — aligners are parameter-free,
    built per window), so prefixing this module's keys with 'task_head.'
    reproduces the exact Lightning layout without paying for the hardcoded
    256..1024-dim trunks of the wrapper ctors."""
    return PixelwiseTaskWithDPT(
        num_channels=num_channels, feature_dim=8, last_dim=8,
        hooks_idx=[1, 2, 3, 4], layer_dims=[8, 8, 16, 16], dim_tokens=[64] * 4,
        is_use_conv3d=True, head_type="regression",
        actpost_scale_factors=actpost, fusion_scale_factors=fusion,
        output_size=output_size, patch_size=(2, 14, 14),
    )


_ACT_DEFAULT = ((1, 2, 2), (1, 1, 1), (0, 0, 0), (-1, -1, -1))
_FUS_DEFAULT = ((1, 2, 2), (1, 2, 2), (2, 2, 2), (2, 2, 2))
_ACT_CAMRAY = ((1, 0, 0), (1, 0, 0), (0, 0, 0), (-1, -1, -1))
_FUS_CAMRAY = ((1, 1, 1), (1, 1, 1), (2, 1, 1), (2, 2, 2))


def _tiny_state_dict(init_values=0.0):
    """Full Lightning-layout state dict at configs/model_tiny.yaml dims."""
    torch.manual_seed(5)
    enc = VideoMAEEncoder(
        img_size=28, patch_size=14, in_chans=3, num_classes=0, embed_dim=64,
        depth=4, num_heads=4, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        init_values=init_values, tubelet_size=2, all_frames=4,
    )
    dense = {
        "flow_2d_backward": _tiny_dpt(2, _ACT_DEFAULT, _FUS_DEFAULT),
        "depth": _tiny_dpt(1, _ACT_DEFAULT, _FUS_DEFAULT),
        "dyn_mask": _tiny_dpt(1, _ACT_DEFAULT, _FUS_DEFAULT),
        "camray": _tiny_dpt(6, _ACT_CAMRAY, _FUS_CAMRAY, output_size=(4, 2, 2)),
    }
    track = VideoMAETrack2DSamHead(
        task_name="track_2d", prompt_embed_dim=64, image_size=[4, 28, 28],
        estimate_vis=True, estimate_depth=True, sam_head_depth=2,
        num_point_embeddings=2, prompt_using_features=True, attend_to_past=True,
        modify_pointlabels_for_windowing=True, estimation_directions=[1],
        depth_fn="exp", vis_fn="linear", max_queries=16)
    sd = {f"l4p_model.video_encoder.{k}": v for k, v in enc.state_dict().items()}
    for name, trunk in dense.items():
        sd.update({
            f"l4p_model.task_heads.{name}.task_head.{k}": v
            for k, v in trunk.state_dict().items()
        })
    sd.update({f"l4p_model.task_heads.track_2d.{k}": v for k, v in track.state_dict().items()})
    return sd


@pytest.fixture(scope="module")
def tiny_sd():
    return _tiny_state_dict()


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg, _ = load_model_config("configs/model_tiny.yaml")
    return cfg


def test_strict_convert_tiny_full_layout(tiny_sd, tiny_cfg):
    params = convert_l4p(tiny_sd, tiny_cfg)
    assert set(params["task_heads"]) == {
        "flow_2d_backward", "depth", "dyn_mask", "camray", "track_2d"}
    w = tiny_sd["l4p_model.video_encoder.blocks.2.mlp.fc1.weight"].numpy()
    np.testing.assert_array_equal(
        np.asarray(params["video_encoder"]["blocks"]["fc1_w"][2]), w)


def test_strict_raises_on_extra_key(tiny_sd, tiny_cfg):
    sd = dict(tiny_sd)
    sd["l4p_model.video_encoder.blocks.0.some_new_tensor"] = torch.zeros(3)
    with pytest.raises(ValueError, match="not consumed"):
        convert_l4p(sd, tiny_cfg)
    # strict=False tolerates it
    convert_l4p(sd, tiny_cfg, strict=False)


def test_strict_raises_on_missing_key(tiny_sd, tiny_cfg):
    sd = dict(tiny_sd)
    del sd["l4p_model.video_encoder.blocks.1.attn.proj.bias"]
    with pytest.raises(KeyError, match="missing key"):
        convert_l4p(sd, tiny_cfg)


def test_strict_raises_on_missing_head(tiny_sd, tiny_cfg):
    sd = {k: v for k, v in tiny_sd.items()
          if not k.startswith("l4p_model.task_heads.dyn_mask.")}
    with pytest.raises(KeyError, match="dyn_mask"):
        convert_l4p(sd, tiny_cfg)
    params = convert_l4p(sd, tiny_cfg, strict=False)
    assert "dyn_mask" not in params["task_heads"]


def test_strict_catches_gamma_config_mismatch(tiny_cfg):
    """A checkpoint trained with LayerScale (gamma_1/gamma_2 present) must
    refuse to load into an init_values=0 config — the old converter dropped
    the gammas silently and produced wrong outputs (VERDICT r2 item 2)."""
    sd = _tiny_state_dict(init_values=0.1)
    assert any(k.endswith("gamma_1") for k in sd)
    with pytest.raises(ValueError, match="gamma"):
        convert_l4p(sd, tiny_cfg)
    # and the matching config consumes them
    cfg_ls = dataclasses.replace(
        tiny_cfg, encoder=dataclasses.replace(tiny_cfg.encoder, init_values=0.1))
    params = convert_l4p(sd, cfg_ls)
    np.testing.assert_allclose(
        np.asarray(params["video_encoder"]["blocks"]["gamma_1"]),
        0.1 * np.ones((4, 64), np.float32))
