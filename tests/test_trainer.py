"""Trainer loop, metrics, and orbax checkpoint round-trip (tiny model)."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from l4p_tpu import checkpoint_io
from l4p_tpu.config import init_l4p_params
from l4p_tpu.metrics import l4p_metrics
from l4p_tpu.trainer import Trainer, TrainerConfig, do_data_sanity_checks
from tests.test_l4p_forward import tiny_cfg, make_data

TASKS = ("depth", "flow_2d_backward", "dyn_mask")


def make_train_batch(T=4, seed=0):
    rng = np.random.default_rng(seed)
    k = np.tile(np.diag([30.0, 30.0, 1, 1]).astype(np.float32)[None, :, :, None], (1, 1, 1, T))
    k[:, 0, 2] = k[:, 1, 2] = 14.0
    return {
        "rgb_b3thw": rng.standard_normal((1, 3, T, 28, 28)).astype(np.float32),
        "intrinsics_b44t": k,
        "depth_b1thw": rng.uniform(1, 5, (1, 1, T, 28, 28)).astype(np.float32),
        "flow_2d_backward_b2thw": rng.standard_normal((1, 2, T, 28, 28)).astype(np.float32),
        "dyn_mask_b1thw": (rng.uniform(size=(1, 1, T, 28, 28)) > 0.5).astype(np.float32),
    }


def test_fit_decreases_loss_and_checkpoints(tmp_path):
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(cfg, TASKS, TrainerConfig(max_steps=6, log_every=2, ckpt_every=3,
                                                out_dir=str(tmp_path), lr=1e-4))
    batches = [make_train_batch(seed=i % 2) for i in range(6)]
    params2, _, step = trainer.fit(params, iter(batches))
    assert step == 6
    # scalars logged
    log = open(os.path.join(tmp_path, "scalars.jsonl")).read().strip().splitlines()
    assert len(log) >= 3
    import json

    first, last = json.loads(log[0]), json.loads(log[-1])
    assert last["scalars/train/loss"] < first["scalars/train/loss"]
    # checkpoints written
    assert glob.glob(os.path.join(tmp_path, "ckpt_*"))


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    path = checkpoint_io.save(str(tmp_path / "ck"), {"params": params, "step": 3})
    restored = checkpoint_io.load(path, like={"params": params, "step": 0})
    assert restored["step"] == 3
    a = jax.tree.leaves(params)[0]
    b = jax.tree.leaves(restored["params"])[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sanity_skip():
    assert do_data_sanity_checks({"track_2d_valid_bn1t": np.zeros((1, 3, 1, 4))})
    assert not do_data_sanity_checks({"track_2d_valid_bn1t": np.ones((1, 3, 1, 4))})


def test_metrics_shapes():
    T = 4
    batch = make_train_batch(T)
    out = {
        "depth_est_b1thw": jnp.asarray(batch["depth_b1thw"]) * 1.1,
        "flow_2d_backward_est_b2thw": jnp.asarray(batch["flow_2d_backward_b2thw"]) + 0.5,
        "dyn_mask_est_b1thw": jnp.asarray(batch["dyn_mask_b1thw"]) * 4 - 2,
    }
    m, _ = l4p_metrics({k: jnp.asarray(v) for k, v in batch.items()}, out)
    assert set(m) >= {"depth/absrel", "flow/epe", "dyn_mask/iou"}
    assert all(np.isfinite(float(v)) for v in m.values())
    # perfect depth prediction after median scaling -> absrel ~ 0
    m2, _ = l4p_metrics(
        {k: jnp.asarray(v) for k, v in batch.items()},
        {"depth_est_b1thw": jnp.asarray(batch["depth_b1thw"]) * 2.0},
    )
    assert float(m2["depth/absrel"]) < 1e-5


def test_track_and_pose_metrics():
    from l4p_tpu.metrics import pose_metrics, track_metrics

    rng = np.random.default_rng(0)
    traj = rng.uniform(0, 224, (1, 5, 2, 8)).astype(np.float32)
    vis = np.ones((1, 5, 1, 8), np.float32)
    m = track_metrics(jnp.asarray(traj), jnp.asarray(vis) * 5, jnp.asarray(traj), jnp.asarray(vis))
    assert float(m["track/delta_avg"]) == 1.0
    assert float(m["track/occ_acc"]) == 1.0

    pose = np.tile(np.eye(4, dtype=np.float32).reshape(16, 1), (1, 8))[None]
    m2 = pose_metrics(jnp.asarray(pose), jnp.asarray(pose))
    assert float(m2["pose/rot_deg"]) < 1e-3
