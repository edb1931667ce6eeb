"""Flash-attention kernel correctness in Pallas interpret mode (CPU) —
validates the kernel math ahead of on-hardware enablement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from l4p_tpu.ops.attention import mha


def _flash_interpret(q, k, v, scale, block_q=256):
    """Run the kernel body via pallas interpret mode."""
    import functools

    from jax.experimental import pallas as pl

    from l4p_tpu.ops.flash_attention import _attn_kernel

    b, h, n, d = q.shape
    bh = b * h
    qf, kf, vf = (x.reshape(bh, n, d) for x in (q, k, v))
    bq = min(block_q, n)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        grid=(bh, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, n, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        interpret=True,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


@pytest.mark.parametrize("n,d", [(512, 88), (256, 128)])
def test_flash_kernel_matches_mha(n, d):
    key = jax.random.PRNGKey(0)
    b, h = 1, 4
    q = jax.random.normal(key, (b, h, n, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, n, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, n, d), jnp.float32)
    scale = d ** -0.5
    ref = mha(q, k, v, scale)
    out = _flash_interpret(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
