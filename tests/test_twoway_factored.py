"""Factored two-way transformer (image-side projections reassociated through
the token bottleneck, models/sam.py) vs the naive direct transcription.

The naive path is the parity oracle (a transcription of reference
sam/transformer.py:21-245); the factored path is the production default.
A third Pallas 'fused' path was deleted in round 4 after the factored path
beat it on chip (PARITY.md)."""

import numpy as np

import jax
import jax.numpy as jnp

from l4p_tpu.models.sam import SamConfig, dense_pe, twoway_transformer_apply
from l4p_tpu.models.track import TrackConfig, init_track_params

NH = 8


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


def test_twoway_default_impl_selection():
    """Query-broadcast PE -> factored; per-query PE -> naive (the factored
    reassociation needs the (1, P, C) broadcast form)."""
    sam, params, img, pos, tokens = _small_sam_fixture()
    q_def, k_def = twoway_transformer_apply(params["transformer"], sam, img, pos, tokens)
    q_fac, k_fac = twoway_transformer_apply(
        params["transformer"], sam, img, pos, tokens, impl="factored"
    )
    np.testing.assert_array_equal(np.asarray(q_def), np.asarray(q_fac))
    np.testing.assert_array_equal(np.asarray(k_def), np.asarray(k_fac))
