"""Streaming (online) inference equals the offline sliding-window forward.

The offline l4p_forward is the oracle: pushing the same frames through
StreamingL4P in arbitrary chunk sizes and concatenating the per-window
emissions (+ flush tail) must reproduce every output of the one-shot run —
same alignment chains, same window-0 K solve, same causal tracking carries,
same PRNG folds.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from l4p_tpu.config import init_l4p_params
from l4p_tpu.models.l4p import l4p_forward
from l4p_tpu.streaming import StreamingL4P, assemble_emissions
from tests.test_l4p_forward import ALL_TASKS, make_data, tiny_cfg


def _u8_data(T, N, seed=0):
    rng = np.random.default_rng(seed)
    data = make_data(T=T, N=N, seed=seed)
    del data["rgb_b3thw"]
    data["rgb_u8_bthw3"] = jnp.asarray(
        rng.integers(0, 256, (1, T, 28, 28, 3), dtype=np.uint8)
    )
    return data


def _stream_all(cfg, params, data, tasks, chunks):
    s = StreamingL4P(
        params, cfg, tasks,
        queries_bn3=data.get("track_2d_pointquerries_bn3"),
        labels_bn=data.get("track_2d_pointlabels_bn"),
    )
    rgb = np.asarray(data["rgb_u8_bthw3"])
    intr = np.asarray(data["intrinsics_b44t"])
    emits = []
    t0 = 0
    for c in chunks:
        emits += s.push(rgb[:, t0 : t0 + c], intr[:, :, :, t0 : t0 + c])
        t0 += c
    assert t0 == rgb.shape[1]
    emits.append(s.flush())
    return assemble_emissions(emits)


def test_streaming_matches_offline_all_tasks():
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    T = 12  # 5 windows at ws=4 / stride=2
    data = _u8_data(T, N=5)
    ref = jax.jit(lambda p, d: l4p_forward(p, cfg, d, ALL_TASKS))(params, data)
    got = _stream_all(cfg, params, data, ALL_TASKS, chunks=[5, 1, 4, 2])
    assert set(got) == set(ref)
    for k in ref:
        assert got[k].shape == ref[k].shape, k
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-4, atol=1e-4, err_msg=k
        )


def test_streaming_matches_offline_depth_only_chain():
    """Non-joint path: the disparity-affine depth chain + overwrite stitches."""
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    T = 10
    data = _u8_data(T, N=3, seed=1)
    tasks = ("depth", "dyn_mask", "flow_2d_backward")
    ref = jax.jit(lambda p, d: l4p_forward(p, cfg, d, tasks))(params, data)
    got = _stream_all(cfg, params, data, tasks, chunks=[4, 6])
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-4, atol=1e-4, err_msg=k
        )


def test_run_sequence_stream_matches_offline():
    """The demo/CLI surface: run_sequence(stream=True) equals the offline
    run_sequence on the same batch (no artifacts)."""
    from l4p_tpu.inference import run_sequence

    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    T = 8
    data = _u8_data(T, N=4, seed=2)
    batch = {k: np.asarray(v) for k, v in data.items()}
    batch["rgb_b3thw"] = (
        batch["rgb_u8_bthw3"].transpose(0, 4, 1, 2, 3) / 255.0
    ).astype(np.float32)
    tasks = ("depth", "dyn_mask", "track_2d")
    ref = run_sequence(params, cfg, tasks, batch, "", "t", dtype=jnp.float32,
                       write_artifacts=False)
    got = run_sequence(params, cfg, tasks, batch, "", "t", dtype=jnp.float32,
                       write_artifacts=False, stream=True)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-4, atol=1e-4, err_msg=k)


def test_streaming_checkpoint_resume():
    """A crashed worker restores a get_state() snapshot and the resumed
    stream's outputs equal the uninterrupted run — including a partially
    buffered (not yet windowed) chunk at the snapshot point."""
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    T = 12
    data = _u8_data(T, N=4, seed=3)
    tasks = ("depth", "dyn_mask", "camray", "track_2d")
    rgb = np.asarray(data["rgb_u8_bthw3"])
    intr = np.asarray(data["intrinsics_b44t"])
    q = data["track_2d_pointquerries_bn3"]

    ref = _stream_all(cfg, params, data, tasks, chunks=[T])

    s1 = StreamingL4P(params, cfg, tasks, queries_bn3=q)
    emits = s1.push(rgb[:, :7], intr[:, :, :, :7])  # 2 windows + 3 buffered
    state = s1.get_state()
    del s1

    s2 = StreamingL4P(params, cfg, tasks, queries_bn3=q)
    s2.set_state(state)
    emits += s2.push(rgb[:, 7:], intr[:, :, :, 7:])
    emits.append(s2.flush())
    got = assemble_emissions(emits)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-4, atol=1e-4, err_msg=k
        )


def test_streaming_tiling_contract():
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    data = _u8_data(9, N=3)  # 9 frames: 3 windows consume 8, 1 frame left over
    rgb = np.asarray(data["rgb_u8_bthw3"])
    intr = np.asarray(data["intrinsics_b44t"])
    s = StreamingL4P(params, cfg, ("dyn_mask",))
    s.push(rgb, intr)
    with pytest.raises(ValueError, match="tile the window grid"):
        s.flush()
    # the failed flush must NOT brick the session: pad as the error says,
    # then flush successfully
    s.push(rgb[:, -1:], intr[:, :, :, -1:])
    tail = s.flush()
    assert tail is not None and "dyn_mask_est_b1thw" in tail


def test_streaming_intrinsics_all_or_nothing():
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    data = _u8_data(8, N=3)
    rgb = np.asarray(data["rgb_u8_bthw3"])
    intr = np.asarray(data["intrinsics_b44t"])
    s = StreamingL4P(params, cfg, ("dyn_mask",))
    s.push(rgb[:, :6], intr[:, :, :, :6])
    # a mid-stream intrinsics drop would silently flip the camray K source;
    # it must error even after earlier chunks were trimmed from the buffer
    with pytest.raises(ValueError, match="every push or never"):
        s.push(rgb[:, 6:])


def test_streaming_warmup_is_state_transparent():
    """warmup() compiles both jit variants on dummy frames and restores the
    session; a subsequent stream equals the never-warmed run."""
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    data = _u8_data(8, N=3, seed=5)
    tasks = ("depth", "dyn_mask", "track_2d")
    ref = _stream_all(cfg, params, data, tasks, chunks=[8])

    s = StreamingL4P(params, cfg, tasks, queries_bn3=data["track_2d_pointquerries_bn3"])
    s.warmup()
    emits = s.push(np.asarray(data["rgb_u8_bthw3"]), np.asarray(data["intrinsics_b44t"]))
    emits.append(s.flush())
    got = assemble_emissions(emits)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-5, atol=1e-5, err_msg=k
        )


def test_streaming_resume_requires_same_key():
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    data = _u8_data(6, N=3)
    s = StreamingL4P(params, cfg, ("dyn_mask",), key=jax.random.PRNGKey(7))
    s.push(np.asarray(data["rgb_u8_bthw3"]), np.asarray(data["intrinsics_b44t"]))
    state = s.get_state()
    s2 = StreamingL4P(params, cfg, ("dyn_mask",))  # default key != 7
    with pytest.raises(ValueError, match="different PRNG key"):
        s2.set_state(state)
