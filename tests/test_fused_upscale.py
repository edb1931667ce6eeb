"""Fused SAM upscale+hypernet Pallas kernel vs the XLA reference chain
(interpret mode on CPU; the real kernel is exercised on TPU by
scripts/profile_components.py and the bench)."""

import numpy as np

import jax
import jax.numpy as jnp

from l4p_tpu.ops.fused_upscale import _upscale_xla, fused_upscale_hypernet


def _inputs(key, n=3, p=16, c=64, d1=24, d2=12, dtype=jnp.float32):
    mk = lambda i, s, sc: jax.random.normal(jax.random.fold_in(key, i), s, dtype) * sc
    return (
        mk(0, (n, p, c), 0.3),
        mk(1, (c, d1, 2, 2, 2), 0.05),
        mk(2, (d1,), 0.1),
        1.0 + mk(3, (d1,), 0.1),
        mk(4, (d1,), 0.1),
        mk(5, (d1, d2, 1, 2, 2), 0.1),
        mk(6, (d2,), 0.1),
        mk(7, (n, 3, d2), 0.3),
    )


def test_fused_upscale_matches_xla_interpret():
    args = _inputs(jax.random.PRNGKey(0))
    ok = fused_upscale_hypernet(*args, True)
    ox = _upscale_xla(*args)
    assert ok.shape == ox.shape == (3, 3, 16, 8, 4)
    np.testing.assert_allclose(np.asarray(ok), np.asarray(ox), rtol=2e-5, atol=2e-5)


def test_fused_upscale_nonaligned_dims():
    """d1/d2 not multiples of 128: the zero-padding scheme must stay exact."""
    args = _inputs(jax.random.PRNGKey(1), p=8, c=32, d1=20, d2=10)
    ok = fused_upscale_hypernet(*args, True)
    ox = _upscale_xla(*args)
    np.testing.assert_allclose(np.asarray(ok), np.asarray(ox), rtol=2e-5, atol=2e-5)


def test_fused_upscale_bf16_fast_branch():
    """bf16 inputs select the fast kernel body (polynomial GELU, one-pass LN,
    reversed hypernet matmul); outputs must agree with the XLA chain to
    bf16-level tolerance (poly GELU error ~1.3e-3 << bf16 rounding)."""
    args32 = _inputs(jax.random.PRNGKey(4))
    args = tuple(a.astype(jnp.bfloat16) for a in args32)
    ok = fused_upscale_hypernet(*args, True)
    ox = _upscale_xla(*args)
    scale = float(np.max(np.abs(np.asarray(ox, dtype=np.float32)))) + 1e-6
    diff = float(np.max(np.abs(np.asarray(ok, np.float32) - np.asarray(ox, np.float32))))
    assert diff <= 0.03 * scale, (diff, scale)


def test_gelu_fast_error_budget():
    """The polynomial GELU must stay within its documented 1.3e-3 abs error
    of the exact erf GELU over a wide input range."""
    from l4p_tpu.ops.fused_upscale import _gelu_fast

    x = jnp.linspace(-12.0, 12.0, 200001, dtype=jnp.float32)
    exact = jax.nn.gelu(x, approximate=False)
    fast = _gelu_fast(x)
    assert float(jnp.max(jnp.abs(fast - exact))) < 1.4e-3


def test_fused_upscale_grad_matches_xla():
    """custom_vjp backward (XLA recompute) must match differentiating the
    reference directly."""
    args = _inputs(jax.random.PRNGKey(2))

    def loss_k(src):
        return (fused_upscale_hypernet(src, *args[1:], True) ** 2).sum()

    def loss_x(src):
        return (_upscale_xla(src, *args[1:]) ** 2).sum()

    g1 = jax.grad(loss_k)(args[0])
    g2 = jax.grad(loss_x)(args[0])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_mask_decoder_uses_xla_path_off_tpu():
    """On CPU the decoder must take the XLA path (kernel gated to TPU)."""
    from l4p_tpu.ops.fused_upscale import fused_upscale_available

    src = jnp.zeros((2, 16, 128), jnp.float32)
    w1 = jnp.zeros((128, 24, 2, 2, 2), jnp.float32)
    assert not fused_upscale_available(src, w1)
