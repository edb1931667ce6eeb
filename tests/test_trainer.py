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


def test_freeze_video_encoder_bitwise(tmp_path):
    """freeze_video_encoder + unfreeze_blocks (reference
    l4p_videomae.py:199-218): frozen params are BITWISE unchanged after fit;
    unfrozen blocks, the final norm, and the heads do change."""
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg(), freeze_video_encoder=True, unfreeze_blocks=(1,))
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(cfg, TASKS, TrainerConfig(max_steps=3, log_every=10, ckpt_every=10,
                                                out_dir=str(tmp_path), lr=1e-3))
    batches = [make_train_batch(seed=i) for i in range(3)]
    params2, _, _ = trainer.fit(params, iter(batches))

    enc0, enc1 = params["video_encoder"], params2["video_encoder"]
    # patch embed + pos embed: bitwise frozen
    np.testing.assert_array_equal(np.asarray(enc0["patch_embed"]["weight"]),
                                  np.asarray(enc1["patch_embed"]["weight"]))
    np.testing.assert_array_equal(np.asarray(enc0["pos_embed"]), np.asarray(enc1["pos_embed"]))
    # frozen block slices bitwise equal, unfrozen block 1 changed
    for k in enc0["blocks"]:
        b0, b1 = np.asarray(enc0["blocks"][k]), np.asarray(enc1["blocks"][k])
        np.testing.assert_array_equal(b0[0], b1[0], err_msg=f"frozen block leaked: {k}")
        np.testing.assert_array_equal(b0[2:], b1[2:], err_msg=f"frozen block leaked: {k}")
    changed = any(
        not np.array_equal(np.asarray(enc0["blocks"][k])[1], np.asarray(enc1["blocks"][k])[1])
        for k in ("qkv_w", "proj_w", "fc1_w", "fc2_w")
    )
    assert changed, "unfreeze_blocks=(1,) did not train block 1"
    # norm unfrozen alongside unfreeze_blocks
    assert not np.array_equal(np.asarray(enc0["norm"]["weight"]), np.asarray(enc1["norm"]["weight"]))
    # heads train
    h0 = jax.tree.leaves(params["task_heads"]["depth"])[0]
    h1 = jax.tree.leaves(params2["task_heads"]["depth"])[0]
    assert not np.array_equal(np.asarray(h0), np.asarray(h1))


def test_freeze_heads_bitwise(tmp_path):
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg(), freeze_heads=("depth",))
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    trainer = Trainer(cfg, TASKS, TrainerConfig(max_steps=2, log_every=10, ckpt_every=10,
                                                out_dir=str(tmp_path), lr=1e-3))
    params2, _, _ = trainer.fit(params, iter([make_train_batch(seed=i) for i in range(2)]))
    for a, b in zip(jax.tree.leaves(params["task_heads"]["depth"]),
                    jax.tree.leaves(params2["task_heads"]["depth"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    f0 = jax.tree.leaves(params["task_heads"]["flow_2d_backward"])[0]
    f1 = jax.tree.leaves(params2["task_heads"]["flow_2d_backward"])[0]
    assert not np.array_equal(np.asarray(f0), np.asarray(f1))


def test_encoder_only_ckpt_init(tmp_path):
    """video_encoder_ckpt_path strict=False analog
    (l4p_videomae.py:187-191): present tensors load, missing keep init,
    extras are ignored."""
    import numpy as _np

    from l4p_tpu.checkpoint import convert_encoder_lenient
    from tests.test_l4p_forward import TINY_ENC

    cfg = TINY_ENC
    params = init_l4p_params(tiny_cfg(), jax.random.PRNGKey(0))["video_encoder"]
    e = cfg.embed_dim
    rng = _np.random.default_rng(0)
    sd = {}
    # full block stack for norm1 only + patch_embed; plus an extra decoder key
    for i in range(cfg.depth):
        sd[f"blocks.{i}.norm1.weight"] = rng.standard_normal(e).astype(_np.float32)
    sd["patch_embed.proj.weight"] = rng.standard_normal(
        (e, 3, cfg.tubelet_size, cfg.patch_size, cfg.patch_size)
    ).astype(_np.float32)
    sd["decoder.blocks.0.attn.qkv.weight"] = rng.standard_normal((3 * e, e)).astype(_np.float32)
    # partial stack (missing block 0) must NOT load
    for i in range(1, cfg.depth):
        sd[f"blocks.{i}.norm2.weight"] = rng.standard_normal(e).astype(_np.float32)

    out = convert_encoder_lenient(sd, cfg, params, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out["blocks"]["norm1_w"][3]), sd["blocks.3.norm1.weight"], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["patch_embed"]["weight"]),
        sd["patch_embed.proj.weight"].reshape(e, -1), rtol=1e-6,
    )
    # missing entries keep init
    np.testing.assert_array_equal(
        np.asarray(out["blocks"]["norm2_w"]), np.asarray(params["blocks"]["norm2_w"])
    )
    np.testing.assert_array_equal(
        np.asarray(out["blocks"]["qkv_w"]), np.asarray(params["blocks"]["qkv_w"])
    )


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
