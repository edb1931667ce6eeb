"""Streaming two-way transformer kernels (ops/fused_keys) vs the naive and
factored paths.

The kernels run in interpret mode here (CPU lane); the math is identical to
the factored reassociation — online softmax over P for t2i, grouped
lane-block softmax via the global-row-max identity for i2t — so fp32 parity
is tight. On-chip bf16 parity is covered by scripts/verify_twoway_tpu.py.
"""

import numpy as np

import jax
import jax.numpy as jnp

from l4p_tpu.models.sam import SamConfig, dense_pe, twoway_transformer_apply
from l4p_tpu.models.track import TrackConfig, init_track_params
from l4p_tpu.ops.fused_keys import fused_keys_available, group_sum_matrix

NH = 8


def _fixture(n=3, seed=3):
    sam = SamConfig(
        embed_dim=128,
        image_embedding_size=(4, 8, 8),
        input_image_size=(8, 112, 112),
        num_heads=NH,
        mlp_dim=64,
        attention_downsample_rate=2,
    )
    tcfg = TrackConfig(sam=sam)
    params = init_track_params(tcfg, jax.random.PRNGKey(seed))["mask_decoder"]
    p, c = sam.num_video_tokens, sam.embed_dim
    img = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, p, c), jnp.float32) * 0.5
    pe = dense_pe({"pe_gaussian": jax.random.normal(jax.random.PRNGKey(seed + 2), (3, c // 2))}, sam)
    pos = pe.reshape(1, c, -1).transpose(0, 2, 1)
    tokens = jax.random.normal(jax.random.PRNGKey(seed + 3), (n, 6, c), jnp.float32) * 0.5
    return sam, params, img, pos, tokens


def test_streamed_matches_naive():
    """Full transformer through the two streaming kernels (interpret mode)
    equals the direct transcription in fp32."""
    sam, params, img, pos, tokens = _fixture()
    qs, ks = twoway_transformer_apply(
        params["transformer"], sam, img, pos, tokens, impl="streamed_interpret"
    )
    qn, kn = twoway_transformer_apply(
        params["transformer"], sam, img, pos, tokens, impl="naive"
    )
    np.testing.assert_allclose(np.asarray(qs), np.asarray(qn), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ks), np.asarray(kn), rtol=1e-5, atol=1e-5)


def test_streamed_matches_factored_tight():
    """Streamed vs factored: the SAME reassociated math (the only deltas are
    online-vs-plain softmax order and an f32 residual add) — near-bitwise."""
    sam, params, img, pos, tokens = _fixture(seed=11)
    qs, ks = twoway_transformer_apply(
        params["transformer"], sam, img, pos, tokens, impl="streamed_interpret"
    )
    qf, kf = twoway_transformer_apply(
        params["transformer"], sam, img, pos, tokens, impl="factored"
    )
    np.testing.assert_allclose(np.asarray(qs), np.asarray(qf), rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(ks), np.asarray(kf), rtol=2e-6, atol=2e-6)


def test_streamed_grad_is_factored_grad():
    """The custom VJP recomputes through the factored path — gradients match
    the factored gradients up to the (1e-6-level) forward output difference
    feeding the cotangents, and sit within oracle tolerance of naive."""
    sam, params, img, pos, tokens = _fixture(seed=21)

    def loss(im, impl):
        q, k = twoway_transformer_apply(params["transformer"], sam, im, pos, tokens, impl=impl)
        return (q ** 2).sum() + (k ** 2).sum()

    gs = jax.grad(lambda im: loss(im, "streamed_interpret"))(img)
    gf = jax.grad(lambda im: loss(im, "factored"))(img)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gf), rtol=1e-5, atol=1e-5)
    gn = jax.grad(lambda im: loss(im, "naive"))(img)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gn), rtol=1e-4, atol=1e-5)


# NOTE: the one-pass-LN `fast` branch (bf16 inputs) has no CPU interpret
# test: this host's XLA:CPU cannot execute bf16 x bf16 -> f32 dots at all
# ("Unsupported element type for DotThunk::Execute"), so neither the
# streamed nor the factored path runs in bf16 off-TPU. The branch is
# covered on hardware by scripts/microbench_twoway.py and the bench
# (bf16 production path), and its math (E[y^2]-E[y]^2 moments) is the
# same one-pass form proven in ops/fused_upscale's fast lane.


def test_group_sum_matrix():
    g = np.asarray(group_sum_matrix(2, 3))
    expect = np.kron(np.eye(2), np.ones((3, 3)))
    np.testing.assert_array_equal(g, expect.astype(np.float32))


def test_fused_keys_gate_off_cpu():
    """The kernel path requires a real single TPU; CPU tests opt in via
    impl='streamed_interpret' explicitly."""
    keys = jnp.zeros((2, 256, 128), jnp.float32)
    assert not fused_keys_available(keys, NH, 6)
