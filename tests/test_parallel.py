"""Multi-chip paths on the virtual 8-device CPU mesh: window-sharded
inference equals the unsharded result; TP-sharded encoder matches
replicated; remat flag is numerically transparent."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from l4p_tpu.config import init_l4p_params
from l4p_tpu.models.encoder import encoder_apply
from l4p_tpu.models.l4p import l4p_forward, track_bidirectional
from l4p_tpu.parallel.mesh import encoder_param_specs, make_mesh
from tests.test_l4p_forward import ALL_TASKS, make_data, tiny_cfg

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_window_sharded_inference_matches_unsharded():
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    data = make_data(T=18, N=4)  # 8 windows at stride 2
    mesh = make_mesh(n_data=8, n_model=1)
    ref = jax.jit(lambda p, d: l4p_forward(p, cfg, d, ("depth", "dyn_mask")))(params, data)
    sharded = jax.jit(lambda p, d: l4p_forward(p, cfg, d, ("depth", "dyn_mask"), mesh=mesh))(params, data)
    for k in ref:
        np.testing.assert_allclose(np.asarray(sharded[k]), np.asarray(ref[k]), rtol=1e-4, atol=1e-4)


def test_query_sharded_tracking_matches_unsharded():
    """The track stage shards its query axis over the mesh 'data' axis
    (run_track_chunked mesh path); outputs must equal the unsharded run.
    N=16 with max_queries=8 also exercises the chunked lax.map under the
    sharding constraint."""
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    data = make_data(T=8, N=16)
    mesh = make_mesh(n_data=8, n_model=1)
    ref = jax.jit(lambda p, d: l4p_forward(p, cfg, d, ("track_2d",)))(params, data)
    sharded = jax.jit(lambda p, d: l4p_forward(p, cfg, d, ("track_2d",), mesh=mesh))(params, data)
    for k in ref:
        np.testing.assert_allclose(np.asarray(sharded[k]), np.asarray(ref[k]), rtol=1e-4, atol=1e-4)


def test_tp_sharded_encoder_matches_replicated():
    from l4p_tpu.models.encoder import EncoderConfig, init_encoder_params

    # mlp_ratio=4 keeps hidden dim divisible by the 2-way model axis
    cfg = EncoderConfig(img_size=28, patch_size=14, embed_dim=64, depth=4,
                        num_heads=4, mlp_ratio=4.0, all_frames=4)
    params = init_encoder_params(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 4, 28, 28)), jnp.float32)
    ref = encoder_apply(params, x, cfg, hooks=(2, 4))

    mesh = make_mesh(n_data=4, n_model=2)
    specs = encoder_param_specs(params)
    sharded_params = jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), params, specs
    )
    out = jax.jit(lambda p, xx: encoder_apply(p, xx, cfg, hooks=(2, 4)))(sharded_params, x)
    np.testing.assert_allclose(np.asarray(out["final"]), np.asarray(ref["final"]), rtol=1e-4, atol=1e-4)


def test_remat_is_numerically_transparent():
    cfg0 = tiny_cfg().encoder
    cfg1 = dataclasses.replace(cfg0, remat_blocks=True)
    params = init_l4p_params(tiny_cfg(), jax.random.PRNGKey(0))["video_encoder"]
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 3, 4, 28, 28)), jnp.float32)

    def loss(p, cfg):
        return (encoder_apply(p, x, cfg, hooks=(4,))["final"] ** 2).mean()

    l0, g0 = jax.value_and_grad(lambda p: loss(p, cfg0))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, cfg1))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_track_bidirectional_covers_pre_query_frames():
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    data = make_data(T=8, N=3)
    # queries in the middle of the video
    q = np.asarray(data["track_2d_pointquerries_bn3"]).copy()
    q[:, :, 0] = 4.5
    data["track_2d_pointquerries_bn3"] = jnp.asarray(q)

    fwd = l4p_forward(params, cfg, data, ("track_2d",))
    bi = track_bidirectional(params, cfg, data)
    # frames at/after the query match the forward pass
    np.testing.assert_allclose(
        np.asarray(bi["track_2d_traj_est_bn2t"][..., 4:]),
        np.asarray(fwd["track_2d_traj_est_bn2t"][..., 4:]),
        rtol=1e-4, atol=1e-4,
    )
    # frames before the query are NOT the forward pass's invalid zeros
    pre_fwd = np.asarray(fwd["track_2d_traj_est_bn2t"][..., :4])
    pre_bi = np.asarray(bi["track_2d_traj_est_bn2t"][..., :4])
    assert np.allclose(pre_fwd, 0), "forward pass should leave pre-query frames at init"
    assert not np.allclose(pre_bi, 0), "bidirectional should fill pre-query frames"
