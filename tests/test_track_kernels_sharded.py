"""shard_map-wrapped fused_keys / fused_upscale kernels on the virtual
8-device CPU mesh (VERDICT r4 item 4).

The query axis N is embarrassingly parallel through the whole track head,
so the streamed two-way kernels and the fused upscale kernel run per-shard
under shard_map over the mesh 'data' axis (interpret mode here; the real
kernel path is TPU-gated). Must equal the XLA paths the mesh used to fall
back to. Template: tests/test_flash_sharded.py. Reference ops being
replaced: sam/transformer.py:21-245, sam/mask_decoder.py:130-140.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from l4p_tpu.models.sam import SamConfig, dense_pe, mask_decoder_apply, twoway_transformer_apply
from l4p_tpu.models.track import TrackConfig, init_track_params
from l4p_tpu.ops.fused_keys import fused_keys_sharded_available
from l4p_tpu.ops.fused_upscale import fused_upscale_sharded_available
from l4p_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")

NH = 8


def _fixture(n=8, seed=3):
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
    pe = dense_pe(
        {"pe_gaussian": jax.random.normal(jax.random.PRNGKey(seed + 2), (3, c // 2))}, sam
    )  # (1, C, t, h, w)
    pos = pe.reshape(1, c, -1).transpose(0, 2, 1)
    tokens = jax.random.normal(jax.random.PRNGKey(seed + 3), (n, 6, c), jnp.float32) * 0.5
    return sam, params, img, pe, pos, tokens


def test_twoway_sharded_matches_factored():
    sam, params, img, _, pos, tokens = _fixture()
    mesh = make_mesh(n_data=4, n_model=2)
    assert fused_keys_sharded_available(mesh, img.shape, NH, tokens.shape[1], interpret=True)

    qs, ks = jax.jit(lambda i, t: twoway_transformer_apply(
        params["transformer"], sam, i, pos, t, mesh=mesh, kernels_interpret=True
    ))(img, tokens)
    qf, kf = twoway_transformer_apply(
        params["transformer"], sam, img, pos, tokens, impl="factored"
    )
    np.testing.assert_allclose(np.asarray(qs), np.asarray(qf), rtol=3e-6, atol=3e-6)
    np.testing.assert_allclose(np.asarray(ks), np.asarray(kf), rtol=3e-6, atol=3e-6)


def test_twoway_sharded_grads_match_factored():
    sam, params, img, _, pos, tokens = _fixture(seed=7)
    mesh = make_mesh(n_data=8, n_model=1)

    def loss(fn):
        def f(i, t):
            q, k = fn(i, t)
            return jnp.sum(jnp.sin(q)) + jnp.sum(jnp.cos(k) * 1e-2)
        return f

    ls = loss(lambda i, t: twoway_transformer_apply(
        params["transformer"], sam, i, pos, t, mesh=mesh, kernels_interpret=True))
    lf = loss(lambda i, t: twoway_transformer_apply(
        params["transformer"], sam, i, pos, t, impl="factored"))
    gs = jax.jit(jax.grad(ls, argnums=(0, 1)))(img, tokens)
    gf = jax.grad(lf, argnums=(0, 1))(img, tokens)
    for a, b in zip(gs, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_mask_decoder_sharded_matches_default():
    sam, params, img, pe, _, tokens = _fixture(seed=5)
    mesh = make_mesh(n_data=4, n_model=2)
    assert fused_upscale_sharded_available(mesh, img.shape, interpret=True)

    out_s, proc_s = jax.jit(lambda i, t: mask_decoder_apply(
        params, sam, i, pe, t, mesh=mesh, kernels_interpret=True
    ))(img, tokens)
    out_r, proc_r = mask_decoder_apply(params, sam, img, pe, tokens)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(proc_s["enc_features"]), np.asarray(proc_r["enc_features"]),
        rtol=3e-6, atol=3e-6,
    )


def test_sharded_gates_reject():
    mesh = make_mesh(n_data=4, n_model=2)
    assert not fused_keys_sharded_available(mesh, (6, 256, 128), NH, 6, interpret=True)  # N % 4
    assert not fused_keys_sharded_available(mesh, (8, 250, 128), NH, 6, interpret=True)  # P % 128
    assert not fused_keys_sharded_available(None, (8, 256, 128), NH, 6, interpret=True)
    assert not fused_upscale_sharded_available(mesh, (6, 256, 128), interpret=True)  # N % 4
    assert not fused_upscale_sharded_available(mesh, (8, 600, 64), interpret=True)  # C < 128
