"""Fused uint8 ingest == host-normalize + patchify + pos-embed."""

import numpy as np

import jax
import jax.numpy as jnp

from l4p_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD
from l4p_tpu.models.encoder import EncoderConfig, init_encoder_params, patchify
from l4p_tpu.models.ingest import ingest_video_tokens


def test_fused_ingest_matches_reference_path():
    cfg = EncoderConfig(img_size=28, patch_size=14, embed_dim=64, depth=2, num_heads=4, all_frames=4)
    params = init_encoder_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (2, 4, 28, 28, 3), np.uint8)

    # reference path: host normalize -> (B,3,T,H,W) fp32 -> patchify + pos
    x = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    x = jnp.asarray(x.transpose(0, 4, 1, 2, 3))
    ref = patchify(x, params["patch_embed"]["weight"], params["patch_embed"]["bias"], cfg)
    ref = ref + params["pos_embed"].astype(ref.dtype)

    out = ingest_video_tokens(params, jnp.asarray(u8), cfg, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_encode_windows_u8_path_matches_float():
    """The wired pipeline: encode_windows(rgb_u8_bthw3=...) == float path on
    the same (uint8-exact) video — token windowing, pos embed, hooks."""
    from tests.test_l4p_forward import tiny_cfg

    cfg = tiny_cfg()
    from l4p_tpu.config import init_l4p_params
    from l4p_tpu.models.l4p import encode_windows

    params = init_l4p_params(cfg, jax.random.PRNGKey(0))["video_encoder"]
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 255, (1, 8, 28, 28, 3), np.uint8)
    x = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    x = jnp.asarray(x.transpose(0, 4, 1, 2, 3))

    ref = encode_windows(params, cfg, x)
    out = encode_windows(params, cfg, None, rgb_u8_bthw3=jnp.asarray(u8))
    np.testing.assert_allclose(
        np.asarray(out["final"]), np.asarray(ref["final"]), rtol=1e-4, atol=1e-4
    )
    for h in ref["hooks"]:
        np.testing.assert_allclose(
            np.asarray(out["hooks"][h]), np.asarray(ref["hooks"][h]), rtol=1e-4, atol=1e-4
        )
