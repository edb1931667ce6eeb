"""Golden parity: l4p_tpu encoder vs the PyTorch reference encoder
(executed from /root/reference with random weights)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.oracle import reference_path
from l4p_tpu.checkpoint import convert_encoder, state_dict_to_numpy
from l4p_tpu.models.encoder import (
    EncoderConfig,
    GIANT,
    encoder_apply,
    init_encoder_params,
    sinusoid_pos_embed,
)

reference_path()

from l4p.models.l4p_videomae import VideoMAEEncoder  # noqa: E402  (reference, oracle only)

SMALL = EncoderConfig(
    img_size=28, patch_size=14, embed_dim=64, depth=6, num_heads=4, mlp_ratio=48 / 11,
    tubelet_size=2, all_frames=4,
)


def make_ref_encoder(cfg: EncoderConfig, seed=0):
    torch.manual_seed(seed)
    enc = VideoMAEEncoder(
        img_size=cfg.img_size,
        patch_size=cfg.patch_size,
        in_chans=3,
        num_classes=0,
        embed_dim=cfg.embed_dim,
        depth=cfg.depth,
        num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        init_values=cfg.init_values,
        tubelet_size=cfg.tubelet_size,
        all_frames=cfg.all_frames,
    )
    enc.eval()
    return enc


def test_sinusoid_pos_embed_matches_reference():
    from l4p.models.VideoMAEv2.models.modeling_finetune import get_sinusoid_encoding_table

    ref = get_sinusoid_encoding_table(32, 64).numpy()
    ours = sinusoid_pos_embed(32, 64)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_encoder_small_parity():
    cfg = SMALL
    enc = make_ref_encoder(cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, cfg.all_frames, cfg.img_size, cfg.img_size)).astype(np.float32)

    with torch.no_grad():
        feats_ref = enc(torch.from_numpy(x))

    params = convert_encoder(state_dict_to_numpy(enc.state_dict()), cfg)
    hooks = [0, 2, 4, 6]
    out = encoder_apply(params, jnp.asarray(x), cfg, hooks=hooks, want_final=True)

    for hook, ours in zip(hooks, out["hooks"]):
        ref = feats_ref[hook].numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4, err_msg=f"hook {hook}")
    # final = head(norm(x_last)) with head=Identity; reference overwrites
    # features_list[-1] (l4p_videomae.py:115)
    np.testing.assert_allclose(np.asarray(out["final"]), feats_ref[-1].numpy(), rtol=1e-4, atol=1e-4)


def test_encoder_layerscale_parity():
    """init_values > 0 enables LayerScale gamma_1/gamma_2 on both sides
    (reference modeling_finetune.py:239-252); outputs must match."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, init_values=0.05)
    enc = make_ref_encoder(cfg, seed=3)
    # confirm the reference actually built gammas (guards the > 0 semantics)
    assert enc.blocks[0].gamma_1 is not None
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, cfg.all_frames, cfg.img_size, cfg.img_size)).astype(np.float32)
    with torch.no_grad():
        feats_ref = enc(torch.from_numpy(x))
    params = convert_encoder(state_dict_to_numpy(enc.state_dict()), cfg)
    assert params["blocks"]["gamma_1"].shape == (cfg.depth, cfg.embed_dim)
    out = encoder_apply(params, jnp.asarray(x), cfg, hooks=[3, 6], want_final=True)
    np.testing.assert_allclose(
        np.asarray(out["hooks"][0]), feats_ref[3].numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["final"]), feats_ref[-1].numpy(), rtol=1e-4, atol=1e-4
    )


def test_init_params_shapes():
    params = init_encoder_params(SMALL, jnp.array([0, 1], dtype=jnp.uint32).view if False else __import__("jax").random.PRNGKey(0))
    assert params["blocks"]["qkv_w"].shape == (6, 3, 64, 64)  # head-aligned TP layout
    assert params["pos_embed"].shape == (1, SMALL.num_tokens, 64)
    out = encoder_apply(params, jnp.zeros((1, 3, 4, 28, 28)), SMALL, hooks=[2, 4])
    assert len(out["hooks"]) == 2 and out["final"].shape == (1, SMALL.num_tokens, 64)


@pytest.mark.slow
def test_encoder_giant_one_window_parity():
    """Full ViT-giant single-window parity (BASELINE config[0] scale).

    Tolerance is backend-dependent: on CPU (fp32, highest matmul precision,
    XLA mha) the measured error is ~2e-5; under L4P_TEST_TPU=1 the Pallas
    flash kernel's internal bf16 passes dominate (~1.8e-3 measured on a real
    v5e, scripts/verify_flash_tpu.py)."""
    import os

    tol = 2e-3 if os.environ.get("L4P_TEST_TPU") else 2e-4
    cfg = GIANT
    enc = make_ref_encoder(cfg, seed=1)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 16, 224, 224)).astype(np.float32)
    with torch.no_grad():
        feats_ref = enc(torch.from_numpy(x))
    params = convert_encoder(state_dict_to_numpy(enc.state_dict()), cfg)
    out = encoder_apply(params, jnp.asarray(x), cfg, hooks=[14, 21, 28, 36])
    for hook, ours in zip([14, 21, 28, 36], out["hooks"]):
        ref = feats_ref[hook].numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=tol, atol=tol, err_msg=f"hook {hook}")
    np.testing.assert_allclose(np.asarray(out["final"]), feats_ref[-1].numpy(), rtol=tol, atol=tol)
