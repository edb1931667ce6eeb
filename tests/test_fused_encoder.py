"""Fused whole-encoder megakernel vs the XLA block path (interpret mode).

Small configs chosen to exercise every structural feature of the kernel:
head-dim padding (D=64 -> 128 lanes), multiple token tiles (N=512 = 2*TQ),
multiple MLP chunks (hidden 3072 -> 2 chunks of 1536), batch > 1, and
mid-stack + final hooks.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from l4p_tpu.models.encoder import EncoderConfig, init_encoder_params
from l4p_tpu.ops.fused_encoder import (
    _run_blocks_xla,
    fused_encoder_available,
    fused_encoder_blocks,
    prepare_fused_params,
)


def _cfg(**kw):
    base = dict(
        img_size=32, patch_size=8, embed_dim=256, depth=3, num_heads=4,
        mlp_ratio=12.0, all_frames=4, use_flash_attention=False,
        flash_interpret=True,
    )
    base.update(kw)
    return EncoderConfig(**base)


@pytest.mark.parametrize(
    "cfg,n,bsz,hooks",
    [
        (_cfg(), 512, 1, (2, 3)),
        (_cfg(mlp_ratio=2.0, depth=2), 256, 2, (1, 2)),
    ],
)
def test_fused_encoder_parity_fp32(cfg, n, bsz, hooks):
    key = jax.random.PRNGKey(0)
    params = init_encoder_params(cfg, key, dtype=jnp.float32)
    assert fused_encoder_available(cfg, params, n)
    x = jax.random.normal(jax.random.PRNGKey(1), (bsz, n, cfg.embed_dim), jnp.float32)

    got = fused_encoder_blocks(params, x, cfg, hooks)
    want = _run_blocks_xla(params, x, cfg, hooks)
    err = float(jnp.max(jnp.abs(got - want)))
    assert err < 2e-5, f"fp32 max err {err}"


def test_fused_encoder_parity_bf16():
    cfg = _cfg()
    key = jax.random.PRNGKey(0)
    params = init_encoder_params(cfg, key, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 512, cfg.embed_dim), jnp.bfloat16)
    got = fused_encoder_blocks(params, x, cfg, (3,)).astype(jnp.float32)
    want = _run_blocks_xla(params, x, cfg, (3,)).astype(jnp.float32)
    scale = float(jnp.max(jnp.abs(want))) + 1e-6
    err = float(jnp.max(jnp.abs(got - want))) / scale
    assert err < 3e-2, f"bf16 rel err {err}"


def test_fused_encoder_grad_matches_xla():
    """custom_vjp backward == grad of the XLA path (it recomputes it)."""
    cfg = _cfg(depth=2, mlp_ratio=2.0)
    params = init_encoder_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 256, cfg.embed_dim), jnp.float32)

    def loss_fused(p):
        return jnp.sum(fused_encoder_blocks(p, x, cfg, (1, 2)) ** 2)

    def loss_xla(p):
        return jnp.sum(_run_blocks_xla(p, x, cfg, (1, 2)) ** 2)

    gf = jax.grad(loss_fused)(params)
    gx = jax.grad(loss_xla)(params)
    for kf, kx in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(kf), np.asarray(kx), rtol=2e-4, atol=2e-4)


def test_gate_rejects_unsupported():
    cfg = _cfg(cos_attn=True)
    params = init_encoder_params(cfg, jax.random.PRNGKey(0))
    assert not fused_encoder_available(cfg, params, 512)
    cfg2 = _cfg(init_values=0.1)
    params2 = init_encoder_params(cfg2, jax.random.PRNGKey(0))
    assert not fused_encoder_available(cfg2, params2, 512)
    cfg3 = _cfg()
    params3 = init_encoder_params(cfg3, jax.random.PRNGKey(0))
    assert not fused_encoder_available(cfg3, params3, 500)  # N % TQ != 0


def test_encoder_apply_fused_path_matches_scan():
    """encoder_apply with the fused gate on (interpret mode) equals the
    default scan path — hooks, final LN, pos embed all included."""
    from l4p_tpu.models.encoder import encoder_apply, fused_encoder_engaged

    cfg = EncoderConfig(
        img_size=112, patch_size=14, embed_dim=256, depth=3, num_heads=4,
        mlp_ratio=2.0, all_frames=8, tubelet_size=2, use_flash_attention=False,
    )
    params = init_encoder_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    assert cfg.num_tokens == 256
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (2, 3, 8, 112, 112), jnp.float32)

    cfg_f = dataclasses.replace(cfg, fused_encoder=True, flash_interpret=True)
    assert fused_encoder_engaged(cfg_f, params, cfg.num_tokens, jnp.float32)
    got = encoder_apply(params, x, cfg_f, hooks=(0, 1, 2, 3), want_final=True)
    want = encoder_apply(params, x, cfg, hooks=(0, 1, 2, 3), want_final=True)
    for g, w_ in zip(got["hooks"] + [got["final"]], want["hooks"] + [want["final"]]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), rtol=2e-5, atol=2e-5)


def test_prepared_params_pad_rows_zero():
    cfg = _cfg()
    params = init_encoder_params(cfg, jax.random.PRNGKey(0))
    fused = prepare_fused_params(params, cfg)
    # wqkv stored transposed (depth, 3, E, nh*DP): pad lanes are columns
    wqkv = np.asarray(fused["wqkv"]).reshape(cfg.depth, 3, cfg.embed_dim, cfg.num_heads, 128)
    assert np.all(wqkv[..., cfg.head_dim:] == 0)
    wproj = np.asarray(fused["wproj"]).reshape(cfg.depth, cfg.num_heads, 128, cfg.embed_dim)
    assert np.all(wproj[:, :, cfg.head_dim:, :] == 0)
