"""Stochastic depth (DropPath, reference modeling_pretrain.py:87-89 /
timm drop_path) and its training integration."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from l4p_tpu.models.encoder import EncoderConfig, encoder_apply, init_encoder_params, _drop_path


TINY = EncoderConfig(
    img_size=28, patch_size=14, embed_dim=32, depth=4, num_heads=4,
    mlp_ratio=2.0, tubelet_size=2, all_frames=4, drop_path_rate=0.6,
)


def test_drop_path_identity_at_eval():
    """No key => deterministic, identical to a zero-rate encoder."""
    p = init_encoder_params(TINY, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 4, 28, 28)), jnp.float32)
    a = encoder_apply(p, x, TINY, hooks=[4])["final"]
    b = encoder_apply(p, x, dataclasses.replace(TINY, drop_path_rate=0.0), hooks=[4])["final"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_drop_path_stochastic_in_train():
    p = init_encoder_params(TINY, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 3, 4, 28, 28)), jnp.float32)
    f = jax.jit(lambda k: encoder_apply(p, x, TINY, hooks=[4], drop_path_key=k)["final"])
    o1, o2 = f(jax.random.PRNGKey(1)), f(jax.random.PRNGKey(2))
    # different keys drop different per-sample branches
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6
    # same key is reproducible
    np.testing.assert_array_equal(np.asarray(f(jax.random.PRNGKey(1))), np.asarray(o1))


def test_drop_path_expectation_scale():
    """E[drop_path(x)] == x (the 1/keep rescale), per-sample mask shape."""
    x = jnp.ones((512, 3, 5), jnp.float32)
    out = _drop_path(x, jnp.float32(0.4), jax.random.PRNGKey(0))
    o = np.asarray(out)
    # each sample is either all-zero or all-1/keep
    vals = np.unique(o.reshape(512, -1))
    assert all(min(abs(v), abs(v - 1 / 0.6)) < 1e-5 for v in vals), vals
    assert abs(o.mean() - 1.0) < 0.1


def test_train_step_with_drop_path():
    """l4p_loss differentiates through stochastic depth (reference drop-path
    training regime); loss finite, encoder grads nonzero."""
    from tests.test_l4p_forward import make_data, tiny_cfg
    from l4p_tpu.config import init_l4p_params
    from l4p_tpu.train import l4p_loss

    cfg = tiny_cfg()
    cfg = dataclasses.replace(cfg, encoder=dataclasses.replace(cfg.encoder, drop_path_rate=0.3))
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    data = {k: v for k, v in make_data(T=4).items()}
    data["depth_b1thw"] = jnp.ones((1, 1, 4, 28, 28), jnp.float32)

    def loss(p, k):
        return l4p_loss(p, cfg, data, ("depth",), key=k)[0]

    l1, g = jax.value_and_grad(loss)(params, jax.random.PRNGKey(3))
    assert np.isfinite(float(l1))
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g["video_encoder"]["blocks"]))
    assert gnorm > 0
    # different keys => different losses (the stochastic path is live)
    l2 = loss(params, jax.random.PRNGKey(4))
    assert abs(float(l1) - float(l2)) > 0
