"""TPU-lane training checks (run with: L4P_TEST_TPU=1 pytest -m tpu).

The giant-scale end-to-end training step is exercised by
scripts/train_step_tpu.py (frozen-encoder ~0.5 s/step, full-model with
remat+adafactor ~0.64 s/step on one v5e); these tests cover the pieces that
only exist on hardware."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from l4p_tpu.ops.attention import mha


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # backend init can fail off-hardware
        return False


# skip (not fail) when a `-m` override pulls the tpu lane onto CPU: the
# Pallas kernel only compiles on real hardware
pytestmark = pytest.mark.skipif(not _on_tpu(), reason="requires a real TPU device")


@pytest.mark.tpu
def test_flash_attention_grad_matches_mha():
    """The Pallas kernel's custom VJP (XLA-math backward) must produce the
    same gradients as differentiating the XLA attention directly."""
    from l4p_tpu.ops.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    b, h, n, d = 1, 4, 512, 88
    q = jax.random.normal(key, (b, h, n, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, n, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, n, d), jnp.float32)
    scale = d ** -0.5

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, scale, 256) ** 2).sum()

    def loss_mha(q, k, v):
        return (mha(q, k, v, scale) ** 2).sum()

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    gm = jax.jit(jax.grad(loss_mha, argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(gf, gm):
        # forward outputs differ by kernel-vs-XLA rounding (~2e-3); the
        # cotangents inherit that scale
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-2, atol=2e-1)
