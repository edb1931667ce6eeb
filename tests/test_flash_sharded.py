"""shard_map-wrapped flash attention on the virtual 8-device CPU mesh.

The mesh path runs the Pallas kernel per shard (interpret mode here — the
real kernel path is TPU-gated) and must equal the XLA `mha` the mesh used
to fall back to (VERDICT r3 item 6). Reference attention being replaced:
modeling_finetune.py:137-190.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from l4p_tpu.ops.attention import mha
from l4p_tpu.ops.flash_attention import (
    DEFAULT_BLOCK_Q,
    flash_attention_sharded,
    flash_sharded_available,
)
from l4p_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _qkv(b=8, h=4, n=DEFAULT_BLOCK_Q, d=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32) * 0.5
    return mk(0), mk(1), mk(2)


def test_sharded_kernel_matches_mha():
    q, k, v = _qkv()
    mesh = make_mesh(n_data=4, n_model=2)
    assert flash_sharded_available(mesh, q.shape, k.shape[-2])
    out = jax.jit(
        lambda q_, k_, v_: flash_attention_sharded(q_, k_, v_, 0.25, mesh, True)
    )(q, k, v)
    ref = mha(q, k, v, 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_sharded_kernel_gradients_match_mha():
    q, k, v = _qkv(b=8, h=2, d=8, seed=1)
    mesh = make_mesh(n_data=8, n_model=1)
    loss_k = lambda q_, k_, v_: jnp.sum(
        jnp.sin(flash_attention_sharded(q_, k_, v_, 0.3, mesh, True))
    )
    loss_r = lambda q_, k_, v_: jnp.sum(jnp.sin(mha(q_, k_, v_, 0.3)))
    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_sharded_gate_rejects_untileable_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert not flash_sharded_available(mesh, (6, 4, 256, 16), 256)   # B % 4 != 0
    assert not flash_sharded_available(mesh, (8, 3, 256, 16), 256)   # H % 2 != 0
    assert not flash_sharded_available(mesh, (8, 4, 128, 16), 128)   # N % block_q != 0
    assert not flash_sharded_available(mesh, (8, 4, 256, 16), 512)   # cross-attn
    assert not flash_sharded_available(None, (8, 4, 256, 16), 256)


def test_encoder_mesh_flash_matches_xla_path():
    """Full encoder under a (data, model) mesh with the interpret-mode
    kernel (flash_interpret=True) vs the plain single-device XLA run —
    exercises the real _attention -> flash_attention_sharded wiring under
    the TP-sharded lax.scan over blocks."""
    from l4p_tpu.models.encoder import EncoderConfig, encoder_apply, init_encoder_params
    from l4p_tpu.parallel.mesh import encoder_param_specs

    # tokens = (8/2) * (56/7)^2 / frame-group = 4 * 64 = 256 = DEFAULT_BLOCK_Q
    cfg = EncoderConfig(img_size=56, patch_size=7, embed_dim=32, depth=2,
                        num_heads=4, mlp_ratio=4.0, all_frames=8)
    params = init_encoder_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((8, 3, 8, 56, 56)), jnp.float32
    )
    ref = encoder_apply(params, x, cfg, hooks=(1, 2))

    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_data=4, n_model=2)
    cfg_mesh = EncoderConfig(**{**cfg.__dict__, "flash_interpret": True})
    specs = encoder_param_specs(params)
    params_sh = jax.device_put(
        params, jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)
    )
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(
        lambda p_, x_: encoder_apply(p_, x_, cfg_mesh, hooks=(1, 2), mesh=mesh)
    )(params_sh, x_sh)

    for a, b in zip(out["hooks"], ref["hooks"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out["final"]), np.asarray(ref["final"]), rtol=2e-5, atol=2e-5
    )
