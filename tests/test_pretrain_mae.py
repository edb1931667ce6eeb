"""MAE pretraining driver: end-to-end tiny run + the pretrain -> finetune
checkpoint handoff (orbax encoder snapshot into video_encoder_ckpt_path)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_pretrain_tiny_runs_and_encoder_init_roundtrips(tmp_path, monkeypatch):
    import pretrain_mae

    out = tmp_path / "mae"
    monkeypatch.setattr(sys, "argv", [
        "pretrain_mae.py", "--size", "tiny", "--steps", "3", "--batch", "1",
        "--warmup", "1", "--out-dir", str(out),
    ])
    pretrain_mae.main()
    assert (out / "scalars.jsonl").exists()
    ckpt = str(out / "ckpt")
    assert os.path.isdir(ckpt)

    # the saved encoder initializes a finetune encoder of the SAME config:
    # every leaf overlays (values come from the pretrained tree)
    from l4p_tpu.config import load_video_encoder_ckpt
    from l4p_tpu.models.encoder import EncoderConfig, init_encoder_params

    enc_cfg = EncoderConfig(img_size=28, patch_size=14, embed_dim=64, depth=2,
                            num_heads=4, mlp_ratio=4.0, all_frames=4)
    init = init_encoder_params(enc_cfg, jax.random.PRNGKey(42), jnp.float32)
    loaded = load_video_encoder_ckpt(init, ckpt, enc_cfg, dtype=jnp.float32)
    assert not np.allclose(
        np.asarray(loaded["blocks"]["qkv_w"]), np.asarray(init["blocks"]["qkv_w"])
    ), "pretrained weights should have overlaid the random init"

    # strict=False analog: a DIFFERENT depth keeps the init on the
    # shape-mismatched stacked-block leaves instead of erroring
    deep_cfg = EncoderConfig(img_size=28, patch_size=14, embed_dim=64, depth=4,
                             num_heads=4, mlp_ratio=4.0, all_frames=4)
    deep_init = init_encoder_params(deep_cfg, jax.random.PRNGKey(43), jnp.float32)
    deep_loaded = load_video_encoder_ckpt(deep_init, ckpt, deep_cfg, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(deep_loaded["blocks"]["qkv_w"]), np.asarray(deep_init["blocks"]["qkv_w"])
    )
    # shape-compatible leaves (patch embed) still overlay
    assert not np.allclose(
        np.asarray(deep_loaded["patch_embed"]["weight"]),
        np.asarray(deep_init["patch_embed"]["weight"]),
    )
