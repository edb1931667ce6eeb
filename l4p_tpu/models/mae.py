"""VideoMAE-style masked-autoencoder pretraining (encoder + pixel decoder).

TPU-first re-design of the reference pretraining stack (reference
modeling_pretrain.py:152-343): the boolean-mask boolean-indexing of visible
tokens becomes static-shape index gathers (visible_idx / masked_idx arrays),
so mask ratio is fixed per jit signature — the standard JAX formulation.

Model registry sizes mirror the reference factories
(modeling_pretrain.py:367-484: small/base/large/huge/giant).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from l4p_tpu.models.encoder import (
    EncoderConfig,
    _block,
    _slice_blocks,
    init_encoder_params,
    patchify,
    sinusoid_pos_embed,
)
from l4p_tpu.ops.conv import layer_norm, linear


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    encoder: EncoderConfig
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 8
    decoder_num_classes: int = 1176 * 2  # 3 * tubelet * patch^2 / ... set per registry

    @property
    def decoder_cfg(self) -> EncoderConfig:
        return dataclasses.replace(
            self.encoder,
            embed_dim=self.decoder_embed_dim,
            depth=self.decoder_depth,
            num_heads=self.decoder_num_heads,
        )


def mae_registry(name: str) -> MAEConfig:
    """Reference @register_model factories (modeling_pretrain.py:367-484)."""
    pix = lambda p, t: 3 * t * p * p
    # decoder_depth is the signature default 8 in every reference factory
    # (modeling_pretrain.py:260; the factories override only embed_dim/heads)
    sizes = {
        "small": dict(patch=16, e=384, d=12, h=6, de=192, dh=3),
        "base": dict(patch=16, e=768, d=12, h=12, de=384, dh=6),
        "large": dict(patch=16, e=1024, d=24, h=16, de=512, dh=8),
        "huge": dict(patch=16, e=1280, d=32, h=16, de=512, dh=8),
        "giant": dict(patch=14, e=1408, d=40, h=16, de=512, dh=8, mlp=48 / 11),
    }
    s = sizes[name]
    enc = EncoderConfig(
        patch_size=s["patch"], embed_dim=s["e"], depth=s["d"], num_heads=s["h"],
        mlp_ratio=s.get("mlp", 4.0),
    )
    return MAEConfig(
        encoder=enc,
        decoder_embed_dim=s["de"],
        decoder_depth=8,
        decoder_num_heads=s["dh"],
        decoder_num_classes=pix(s["patch"], enc.tubelet_size),
    )


def init_mae_params(cfg: MAEConfig, key: jax.Array, dtype=jnp.float32) -> Dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    enc = init_encoder_params(cfg.encoder, k1, dtype)
    dec_cfg = cfg.decoder_cfg
    dec = init_encoder_params(dec_cfg, k2, dtype)
    del dec["patch_embed"], dec["pos_embed"]
    de = cfg.decoder_embed_dim
    a = float(np.sqrt(6.0 / (cfg.encoder.embed_dim + de)))
    head_a = float(np.sqrt(6.0 / (de + cfg.decoder_num_classes)))
    return {
        "encoder": enc,
        "decoder": dec,
        "encoder_to_decoder": {"weight": jax.random.uniform(k3, (de, cfg.encoder.embed_dim), dtype, -a, a)},
        "mask_token": 0.02 * jax.random.truncated_normal(k4, -2, 2, (1, 1, de), dtype),
        "decoder_pos_embed": jnp.asarray(sinusoid_pos_embed(cfg.encoder.num_tokens, de), dtype),
        "decoder_head": {
            "weight": jax.random.uniform(k5, (cfg.decoder_num_classes, de), dtype, -head_a, head_a),
            "bias": jnp.zeros((cfg.decoder_num_classes,), dtype),
        },
    }


def _run_blocks(params_blocks: Dict, x: jnp.ndarray, cfg: EncoderConfig) -> jnp.ndarray:
    def body(carry, p):
        return _block(carry, p, cfg), None

    out, _ = jax.lax.scan(body, x, params_blocks)
    return out


def mae_encode_visible(
    enc_params: Dict, x_b3thw: jnp.ndarray, visible_idx_bn: jnp.ndarray, cfg: EncoderConfig
) -> jnp.ndarray:
    """Masked encoder forward (modeling_pretrain.py:129-149): embed, keep
    visible tokens (index gather instead of boolean indexing), run blocks,
    norm."""
    x = patchify(x_b3thw, enc_params["patch_embed"]["weight"], enc_params["patch_embed"]["bias"], cfg)
    x = x + jax.lax.stop_gradient(enc_params["pos_embed"].astype(x.dtype))
    x_vis = jnp.take_along_axis(x, visible_idx_bn[..., None], axis=1)
    x_vis = _run_blocks(enc_params["blocks"], x_vis, cfg)
    return layer_norm(x_vis, enc_params["norm"]["weight"], enc_params["norm"]["bias"], cfg.ln_eps)


def mae_forward(
    params: Dict,
    cfg: MAEConfig,
    x_b3thw: jnp.ndarray,
    visible_idx_bn: jnp.ndarray,
    masked_idx_bm: jnp.ndarray,
) -> jnp.ndarray:
    """Full MAE forward (modeling_pretrain.py:346-364): encode visible,
    project to decoder width, append mask tokens with their pos embeddings,
    decode, predict pixels of the masked tubelets. Returns (B, M, num_classes)."""
    enc_cfg = cfg.encoder
    x_vis = mae_encode_visible(params["encoder"], x_b3thw, visible_idx_bn, enc_cfg)
    x_vis = linear(x_vis, params["encoder_to_decoder"]["weight"])

    pos = params["decoder_pos_embed"].astype(x_vis.dtype)  # (1, N, C_d)
    b = x_vis.shape[0]
    pos_b = jnp.broadcast_to(pos, (b,) + pos.shape[1:])
    pos_vis = jnp.take_along_axis(pos_b, visible_idx_bn[..., None], axis=1)
    pos_mask = jnp.take_along_axis(pos_b, masked_idx_bm[..., None], axis=1)

    mask_tok = params["mask_token"].astype(x_vis.dtype)
    x_full = jnp.concatenate([x_vis + pos_vis, mask_tok + pos_mask], axis=1)

    dec_cfg = cfg.decoder_cfg
    x = _run_blocks(params["decoder"]["blocks"], x_full, dec_cfg)
    m = masked_idx_bm.shape[1]
    x = x[:, -m:]
    x = layer_norm(x, params["decoder"]["norm"]["weight"], params["decoder"]["norm"]["bias"], dec_cfg.ln_eps)
    return linear(x, params["decoder_head"]["weight"], params["decoder_head"]["bias"])


def tube_mask_indices(
    key: jax.Array, cfg: EncoderConfig, batch: int, mask_ratio: float = 0.9
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """VideoMAE tube masking: one spatial mask shared across tubelet steps.
    Returns (visible_idx (B, n_vis), masked_idx (B, n_mask))."""
    t, h, w = cfg.tokens_thw
    n_space = h * w
    n_mask_space = int(n_space * mask_ratio)
    keys = jax.random.split(key, batch)

    def one(k):
        perm = jax.random.permutation(k, n_space)
        vis_sp = jnp.sort(perm[n_mask_space:])
        mask_sp = jnp.sort(perm[:n_mask_space])
        toff = (jnp.arange(t) * n_space)[:, None]
        return (vis_sp[None] + toff).reshape(-1), (mask_sp[None] + toff).reshape(-1)

    vis, mask = jax.vmap(one)(keys)
    return vis, mask


def mae_pretrain_loss(
    params: Dict,
    cfg: MAEConfig,
    x_b3thw: jnp.ndarray,
    key: jax.Array,
    mask_ratio: float = 0.9,
    normalize_target: bool = True,
) -> jnp.ndarray:
    """MSE on normalized masked tubelet pixels — the standard VideoMAE
    objective for this architecture."""
    b = x_b3thw.shape[0]
    vis_idx, mask_idx = tube_mask_indices(key, cfg.encoder, b, mask_ratio)
    pred = mae_forward(params, cfg, x_b3thw, vis_idx, mask_idx)

    p, tt = cfg.encoder.patch_size, cfg.encoder.tubelet_size
    bsz, c, t, h, w = x_b3thw.shape
    tgt = x_b3thw.reshape(bsz, c, t // tt, tt, h // p, p, w // p, p)
    tgt = tgt.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(bsz, -1, c * tt * p * p)
    tgt = jnp.take_along_axis(tgt, mask_idx[..., None], axis=1).astype(jnp.float32)
    if normalize_target:
        mu = tgt.mean(-1, keepdims=True)
        var = tgt.var(-1, keepdims=True)
        tgt = (tgt - mu) / jnp.sqrt(var + 1e-6)
    return jnp.mean((pred.astype(jnp.float32) - tgt) ** 2)
