"""Parity for encoder variants: cosine attention, Plucker camera embedding,
and the MAE pretraining model."""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.oracle import reference_path
from l4p_tpu.checkpoint import convert_encoder, convert_mae, state_dict_to_numpy
from l4p_tpu.models.encoder import EncoderConfig, encoder_apply
from l4p_tpu.models.mae import MAEConfig, mae_forward, mae_registry, init_mae_params, mae_pretrain_loss

reference_path()

from l4p.models.l4p_videomae import VideoMAEEncoder  # noqa: E402
from l4p.models.VideoMAEv2.models.modeling_pretrain import PretrainVisionTransformer  # noqa: E402

SMALL = EncoderConfig(
    img_size=28, patch_size=14, embed_dim=64, depth=4, num_heads=4, mlp_ratio=4.0,
    tubelet_size=2, all_frames=4,
)


def test_cos_attention_parity():
    cfg = dataclasses.replace(SMALL, cos_attn=True)
    torch.manual_seed(7)
    enc = VideoMAEEncoder(
        img_size=cfg.img_size, patch_size=cfg.patch_size, in_chans=3, num_classes=0,
        embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        init_values=0.0, tubelet_size=2, all_frames=cfg.all_frames, cos_attn=True,
    )
    enc.eval()
    # break the symmetric init of the log-scale so the clamp path is real
    with torch.no_grad():
        for blk in enc.blocks:
            blk.attn.scale.add_(torch.randn_like(blk.attn.scale) * 0.5)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, 4, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(x))
    params = convert_encoder(state_dict_to_numpy(enc.state_dict()), cfg)
    out = encoder_apply(params, jnp.asarray(x), cfg, hooks=[2, 4])
    np.testing.assert_allclose(np.asarray(out["final"]), ref[-1].numpy(), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("placed_at,emb_type", [("input", "add"), ("output", "add"), ("input", "concat")])
def test_camera_embedding_parity(placed_at, emb_type):
    cfg = dataclasses.replace(SMALL, cam_emb_placed_at=placed_at, cam_emb_type=emb_type)
    torch.manual_seed(8)
    enc = VideoMAEEncoder(
        img_size=cfg.img_size, patch_size=cfg.patch_size, in_chans=3, num_classes=0,
        embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        init_values=0.0, tubelet_size=2, all_frames=cfg.all_frames,
        cam_emb_placed_at=placed_at, cam_emb_type=emb_type,
    )
    enc.eval()
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 3, 4, 28, 28)).astype(np.float32)
    # normalized intrinsics + mild extrinsics
    k = np.zeros((1, 4, 4, 4), np.float32)
    k[:, 0, 0] = 1.1
    k[:, 1, 1] = 1.2
    k[:, 0, 2] = k[:, 1, 2] = 0.5
    k[:, 2, 2] = k[:, 3, 3] = 1.0
    e = np.tile(np.eye(4, dtype=np.float32)[None, :, :, None], (1, 1, 1, 4))
    e[:, 0, 3] = np.linspace(0, 0.3, 4)
    with torch.no_grad():
        ref = enc(torch.from_numpy(x), torch.from_numpy(k), torch.from_numpy(e))
    params = convert_encoder(state_dict_to_numpy(enc.state_dict()), cfg)
    out = encoder_apply(
        params, jnp.asarray(x), cfg, hooks=[0, 2, 4],
        intrinsics_b44t=jnp.asarray(k), extrinsics_b44t=jnp.asarray(e),
    )
    for i, h in enumerate([0, 2, 4]):
        np.testing.assert_allclose(
            np.asarray(out["hooks"][i]), ref[h].numpy(), rtol=3e-4, atol=3e-4, err_msg=f"hook {h}"
        )


def test_mae_parity():
    cfg = MAEConfig(encoder=SMALL, decoder_embed_dim=32, decoder_depth=2,
                    decoder_num_heads=4, decoder_num_classes=3 * 2 * 14 * 14)
    torch.manual_seed(9)
    ref = PretrainVisionTransformer(
        img_size=28, patch_size=14, encoder_in_chans=3, encoder_num_classes=0,
        encoder_embed_dim=64, encoder_depth=4, encoder_num_heads=4,
        decoder_num_classes=3 * 2 * 14 * 14, decoder_embed_dim=32, decoder_depth=2,
        decoder_num_heads=4, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        init_values=0.0, tubelet_size=2, all_frames=4,
    )
    ref.eval()
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 3, 4, 28, 28)).astype(np.float32)
    n_tokens = SMALL.num_tokens  # 8
    mask = np.zeros((2, n_tokens), bool)
    mask[:, [1, 3, 5, 6]] = True  # 4 masked tokens
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(mask))

    params = convert_mae(state_dict_to_numpy(ref.state_dict()), cfg)
    vis_idx = np.stack([np.where(~m)[0] for m in mask])
    mask_idx = np.stack([np.where(m)[0] for m in mask])
    out = mae_forward(params, cfg, jnp.asarray(x), jnp.asarray(vis_idx), jnp.asarray(mask_idx))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=2e-4, atol=2e-4)


def test_mae_pretrain_loss_runs():
    cfg = mae_registry("small")
    cfg = MAEConfig(encoder=SMALL, decoder_embed_dim=32, decoder_depth=2,
                    decoder_num_heads=4, decoder_num_classes=3 * 2 * 14 * 14)
    params = init_mae_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 4, 28, 28)), jnp.float32)
    loss = mae_pretrain_loss(params, cfg, x, jax.random.PRNGKey(1), mask_ratio=0.5)
    assert np.isfinite(float(loss))
    # gradient flows
    g = jax.grad(lambda p: mae_pretrain_loss(p, cfg, x, jax.random.PRNGKey(1), 0.5))(params)
    gn = float(jnp.linalg.norm(g["encoder"]["blocks"]["qkv_w"]))
    assert np.isfinite(gn) and gn > 0


def test_mae_registry_sizes():
    g = mae_registry("giant")
    assert g.encoder.embed_dim == 1408 and g.encoder.depth == 40
    assert g.decoder_num_classes == 3 * 2 * 14 * 14


def test_unroll_and_compute_dtype_out_flags_are_transparent():
    """The perf knobs (unroll_blocks, matmul_out_compute_dtype) must be
    numerically transparent in fp32 — unrolling reorders nothing, and with
    fp32 operands the einsum output dtype is fp32 either way. (Under bf16 the
    dtype knob intentionally changes low-order bits; it defaults off.)"""
    from l4p_tpu.models.encoder import init_encoder_params

    params = init_encoder_params(SMALL, jax.random.PRNGKey(3))
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 3, 4, 28, 28)), jnp.float32)
    ref = encoder_apply(params, x, SMALL, hooks=(1, 3))
    for unroll in (False, True):
        for cdt in (False, True):
            if not unroll and not cdt:
                continue
            cfg = dataclasses.replace(SMALL, unroll_blocks=unroll, matmul_out_compute_dtype=cdt)
            out = encoder_apply(params, x, cfg, hooks=(1, 3))
            np.testing.assert_array_equal(np.asarray(out["final"]), np.asarray(ref["final"]))
            for a, b in zip(out["hooks"], ref["hooks"]):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unroll_matches_scan_with_drop_path():
    """Stochastic depth folds per-block keys identically under scan and
    unroll (dp_keys[i] per block in both) — same masks, same math. Not
    bitwise: under unroll XLA constant-folds each block's keep rate (the
    linspace is static) and rounds the 1/keep rescale differently than the
    scan's runtime division (~1e-6)."""
    from l4p_tpu.models.encoder import init_encoder_params

    cfg0 = dataclasses.replace(SMALL, drop_path_rate=0.5)
    cfg1 = dataclasses.replace(cfg0, unroll_blocks=True)
    params = init_encoder_params(cfg0, jax.random.PRNGKey(4))
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 3, 4, 28, 28)), jnp.float32)
    k = jax.random.PRNGKey(9)
    a = encoder_apply(params, x, cfg0, hooks=(2,), drop_path_key=k)
    b = encoder_apply(params, x, cfg1, hooks=(2,), drop_path_key=k)
    np.testing.assert_allclose(
        np.asarray(a["final"]), np.asarray(b["final"]), rtol=1e-5, atol=1e-5
    )
