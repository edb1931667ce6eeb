"""Fused two-way-transformer Pallas kernels vs the XLA reference
(interpret mode on CPU; the real kernels are exercised on TPU by
scripts/profile_components.py and the bench)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from l4p_tpu.models.sam import SamConfig, dense_pe, twoway_transformer_apply
from l4p_tpu.models.track import TrackConfig, init_track_params
from l4p_tpu.ops.fused_twoway import _i2t_xla, _t2i_xla, i2t_block, t2i_attention

NH = 8


def _t2i_inputs(key, n=2, p=1024, c=128, d=64, q=6):
    mk = lambda i, s, sc: jax.random.normal(jax.random.fold_in(key, i), s, jnp.float32) * sc
    return (
        mk(0, (n, p, c), 0.5),      # keys
        mk(1, (n, q, d), 0.5),      # projected (+PE) queries
        mk(2, (d, c), 0.1),         # wk (torch layout)
        mk(3, (d,), 0.1),           # bk
        mk(4, (d, c), 0.1),         # wv
        mk(5, (d,), 0.1),           # bv
        mk(6, (p, c), 0.5),         # raw image PE
    )


def _i2t_inputs(key, n=2, p=1024, c=128, d=64, q=6):
    mk = lambda i, s, sc: jax.random.normal(jax.random.fold_in(key, i), s, jnp.float32) * sc
    return (
        mk(0, (n, p, c), 0.5),      # keys
        mk(1, (n, q, d), 0.5),      # k_tok (projected +PE)
        mk(2, (n, q, d), 0.5),      # v_tok
        mk(3, (d, c), 0.1),         # wq
        mk(4, (d,), 0.1),           # bq
        mk(5, (p, c), 0.5),         # raw image PE
        mk(6, (c, d), 0.1),         # wout
        mk(7, (c,), 0.1),           # bout
        1.0 + mk(8, (c,), 0.1),     # ln_w
        mk(9, (c,), 0.1),           # ln_b
    )


def test_t2i_attention_matches_xla_interpret():
    """Multi-tile online softmax (P=1024 -> 2 grid steps at block 512)."""
    args = _t2i_inputs(jax.random.PRNGKey(0))
    ok = t2i_attention(*args, NH, True)
    ox = _t2i_xla(*args, NH)
    assert ok.shape == (2, 6, 64)
    np.testing.assert_allclose(np.asarray(ok), np.asarray(ox), rtol=2e-4, atol=2e-5)


def test_i2t_block_matches_xla_interpret():
    args = _i2t_inputs(jax.random.PRNGKey(1))
    ok = i2t_block(*args, NH, 1e-5, True)
    ox = _i2t_xla(*args, NH, 1e-5)
    assert ok.shape == (2, 1024, 128)
    np.testing.assert_allclose(np.asarray(ok), np.asarray(ox), rtol=2e-4, atol=2e-4)


def test_t2i_grad_matches_xla():
    """custom_vjp backward (XLA recompute) must match differentiating the
    reference directly."""
    args = _t2i_inputs(jax.random.PRNGKey(2), p=256)

    g1 = jax.grad(lambda k: (t2i_attention(k, *args[1:], NH, True) ** 2).sum())(args[0])
    g2 = jax.grad(lambda k: (_t2i_xla(k, *args[1:], NH) ** 2).sum())(args[0])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_twoway_transformer_fused_matches_xla():
    """Full two-way transformer: fused image-side kernels (interpret) vs the
    pure-XLA block path, on a small-but-structured SAM config."""
    sam = SamConfig(
        embed_dim=128,
        image_embedding_size=(4, 8, 8),
        input_image_size=(8, 112, 112),
        num_heads=NH,
        mlp_dim=64,
        attention_downsample_rate=2,
    )
    tcfg = TrackConfig(sam=sam)
    params = init_track_params(tcfg, jax.random.PRNGKey(3))["mask_decoder"]

    n, p, c = 3, sam.num_video_tokens, sam.embed_dim
    img = jax.random.normal(jax.random.PRNGKey(4), (n, p, c), jnp.float32) * 0.5
    pe = dense_pe({"pe_gaussian": jax.random.normal(jax.random.PRNGKey(5), (3, c // 2))}, sam)
    pos = pe.reshape(1, c, -1).transpose(0, 2, 1)
    tokens = jax.random.normal(jax.random.PRNGKey(6), (n, 6, c), jnp.float32) * 0.5

    qf, kf = twoway_transformer_apply(
        params["transformer"], sam, img, pos, tokens, force_fused=True, interpret=True
    )
    qx, kx = twoway_transformer_apply(
        params["transformer"], sam, img, pos, tokens, force_fused=False
    )
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qx), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(kf), np.asarray(kx), rtol=2e-4, atol=2e-4)


def test_twoway_uses_xla_path_off_tpu():
    """On CPU the transformer must take the XLA path (kernel gated to TPU)."""
    from l4p_tpu.ops.fused_twoway import fused_twoway_available

    assert not fused_twoway_available(jnp.zeros((1, 2048, 1408), jnp.bfloat16))


def _small_sam_fixture():
    sam = SamConfig(
        embed_dim=128,
        image_embedding_size=(4, 8, 8),
        input_image_size=(8, 112, 112),
        num_heads=NH,
        mlp_dim=64,
        attention_downsample_rate=2,
    )
    tcfg = TrackConfig(sam=sam)
    params = init_track_params(tcfg, jax.random.PRNGKey(3))["mask_decoder"]
    n, p, c = 3, sam.num_video_tokens, sam.embed_dim
    img = jax.random.normal(jax.random.PRNGKey(4), (n, p, c), jnp.float32) * 0.5
    pe = dense_pe({"pe_gaussian": jax.random.normal(jax.random.PRNGKey(5), (3, c // 2))}, sam)
    pos = pe.reshape(1, c, -1).transpose(0, 2, 1)
    tokens = jax.random.normal(jax.random.PRNGKey(6), (n, 6, c), jnp.float32) * 0.5
    return sam, params, img, pos, tokens


def test_twoway_transformer_factored_matches_naive():
    """The factored path (image-side projections reassociated through the
    token bottleneck, sam._t2i_factored/_i2t_factored) is the same math as
    the direct transcription — fp32 rounding only."""
    sam, params, img, pos, tokens = _small_sam_fixture()
    qa, ka = twoway_transformer_apply(params["transformer"], sam, img, pos, tokens, impl="factored")
    qx, kx = twoway_transformer_apply(params["transformer"], sam, img, pos, tokens, impl="naive")
    np.testing.assert_allclose(np.asarray(qa), np.asarray(qx), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ka), np.asarray(kx), rtol=1e-5, atol=1e-5)


def test_twoway_transformer_factored_grad_matches_naive():
    """Native autodiff through the factored einsums equals differentiating
    the direct transcription (verified against a float64 oracle during
    development: both paths sit ~1.8e-6 from it — pure reassociation)."""
    sam, params, img, pos, tokens = _small_sam_fixture()

    def loss(im, impl):
        q, k = twoway_transformer_apply(params["transformer"], sam, im, pos, tokens, impl=impl)
        return (q ** 2).sum() + (k ** 2).sum()

    g1 = jax.grad(lambda im: loss(im, "factored"))(img)
    g2 = jax.grad(lambda im: loss(im, "naive"))(img)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)
