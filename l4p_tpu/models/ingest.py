"""Fused on-device video ingest: uint8 frames -> encoder tokens.

The reference normalizes on the host in fp32 and ships (B,3,T,H,W) float
video to the device (l4p_dataset_mini.py:576-580 + Lightning's device move,
l4p.py:56-58). Here the host ships raw uint8 (4x less transfer over
PCIe/ICI-attached hosts) and one jitted function does
ImageNet-normalize -> tubelet patchify -> embed -> +pos-embed, which XLA
fuses so the normalized fp32 video never materializes in HBM
(SURVEY.md section 7: fused ingest).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp

from l4p_tpu.models.encoder import EncoderConfig, GIANT
from l4p_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD


def ingest_video_tokens(
    enc_params: Dict,
    rgb_u8_bthw3: jnp.ndarray,
    cfg: EncoderConfig = GIANT,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    compute_dtype=jnp.bfloat16,
    add_pos_embed: bool = True,
) -> jnp.ndarray:
    """(B, T, H, W, 3) uint8 -> (B, N_tokens, E) embedded tokens.

    With add_pos_embed=False the caller adds the (per-window) positional
    table itself — used by encode_windows, which tokenizes the WHOLE video
    once and slices token windows afterwards (the positional table spans one
    window, not the video).

    Fuses normalization into the patch-embedding matmul by folding the
    per-channel affine (x/255 - mean)/std into the patch weights and bias:
        W' = W * scale_c,  b' = b + W @ (shift_c * ones_patch)
    so the device kernel is a single uint8->bf16 cast + one MXU matmul.
    """
    mean = IMAGENET_MEAN if mean is None else np.asarray(mean, np.float32)
    std = IMAGENET_STD if std is None else np.asarray(std, np.float32)
    b, t, h, w, c = rgb_u8_bthw3.shape
    p, tt, e = cfg.patch_size, cfg.tubelet_size, cfg.embed_dim

    w_flat = enc_params["patch_embed"]["weight"].astype(jnp.float32)  # (E, C*tt*p*p)
    bias = enc_params["patch_embed"]["bias"].astype(jnp.float32)

    # per-input-element affine: x_norm = x_u8 * scale_c + shift_c
    scale_c = (1.0 / (255.0 * std)).astype(np.float32)  # (3,)
    shift_c = (-mean / std).astype(np.float32)
    k = c * tt * p * p
    # patch feature ordering is (c, dt, dh, dw) — repeat per-channel terms
    scale_k = jnp.asarray(np.repeat(scale_c, tt * p * p))  # (K,)
    shift_k = jnp.asarray(np.repeat(shift_c, tt * p * p))
    w_fold = w_flat * scale_k[None, :]
    b_fold = bias + w_flat @ shift_k

    # tubelet patch extraction on raw uint8 (cheap reshape/transpose)
    x = rgb_u8_bthw3.astype(compute_dtype)
    x = x.transpose(0, 4, 1, 2, 3)  # (B, C, T, H, W)
    t2, h2, w2 = t // tt, h // p, w // p
    x = x.reshape(b, c, t2, tt, h2, p, w2, p).transpose(0, 2, 4, 6, 1, 3, 5, 7)
    x = x.reshape(b, t2 * h2 * w2, k)

    tok = jnp.einsum("bnk,ek->bne", x, w_fold.astype(compute_dtype), preferred_element_type=jnp.float32)
    tok = (tok + b_fold).astype(compute_dtype)
    if add_pos_embed:
        tok = tok + enc_params["pos_embed"].astype(compute_dtype)
    return tok
