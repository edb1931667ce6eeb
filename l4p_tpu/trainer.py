"""Training/evaluation loop driver — the L2 layer.

TPU-native replacement for the reference's Lightning module + Trainer
(reference l4p/l4p.py:12-126 + LightningCLI at l4p/main.py): a plain loop
over a host data iterator driving a pjit-ed train step on a (data, model)
mesh, with orbax checkpointing, JSONL scalar logging (the reference logs
`scalars/{phase}/{key}`, l4p.py:82-91), periodic validation, and the same
degenerate-batch skip (l4p.py:41-52).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Dict, Iterable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import optax

from l4p_tpu.models.l4p import L4PConfig
from l4p_tpu.metrics import l4p_metrics
from l4p_tpu.train import l4p_loss, make_optimizer, trainable_mask
from l4p_tpu import checkpoint_io


@dataclasses.dataclass
class TrainerConfig:
    max_steps: int = 10000
    lr: float = 1e-4
    weight_decay: float = 0.05
    log_every: int = 50
    ckpt_every: int = 1000
    val_every: int = 1000
    out_dir: str = "runs/default"
    mesh_model_axis: int = 1


def do_data_sanity_checks(batch: Dict[str, np.ndarray]) -> bool:
    """Skip train batches with all-invalid tracks (reference l4p.py:41-52)."""
    if "track_2d_valid_bn1t" in batch:
        if np.sum(np.asarray(batch["track_2d_valid_bn1t"])) == 0:
            return True
    return False


class Trainer:
    def __init__(
        self,
        model_cfg: L4PConfig,
        tasks: Sequence[str],
        trainer_cfg: TrainerConfig = TrainerConfig(),
        loss_fn: Optional[Callable] = None,
        metrics_fn: Optional[Callable] = l4p_metrics,
    ):
        self.model_cfg = model_cfg
        self.tasks = tuple(tasks)
        self.cfg = trainer_cfg
        if loss_fn is None:
            self.loss_fn = lambda p, b, k: l4p_loss(p, model_cfg, b, self.tasks, key=k)
        else:  # user losses keep the reference (params, batch) contract
            self.loss_fn = lambda p, b, k: loss_fn(p, b)
        self.metrics_fn = metrics_fn
        # the trainable mask (freeze flags, reference l4p_videomae.py:199-218,
        # plus the always-frozen sinusoid pos_embed buffer) needs the param
        # tree, so the optimizer is ALWAYS built lazily at first fit/restore —
        # building unmasked here would let AdamW weight decay drift the
        # non-learnable pos_embed even in the no-freeze-flags path
        self.optimizer = None
        os.makedirs(trainer_cfg.out_dir, exist_ok=True)
        self._log_f = open(os.path.join(trainer_cfg.out_dir, "scalars.jsonl"), "a")
        # save the resolved run config (LightningCLI's save_config with
        # overwrite=True, reference main.py:11)
        with open(os.path.join(trainer_cfg.out_dir, "config.json"), "w") as f:
            json.dump(
                {"tasks": list(self.tasks), "trainer": dataclasses.asdict(trainer_cfg),
                 "model": repr(model_cfg)},
                f, indent=2,
            )

        @jax.jit
        def _step(params, opt_state, batch, key):
            (loss, loss_dict), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, batch, key
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, loss_dict

        self._step = _step

        from l4p_tpu.models.l4p import l4p_forward

        # jitted once — a fresh lambda per validate() call would retrace the
        # full forward graph every validation interval
        self._fwd = jax.jit(lambda p, b: l4p_forward(p, self.model_cfg, b, self.tasks))

    def log(self, phase: str, step: int, scalars: Dict[str, float]):
        rec = {"step": step, **{f"scalars/{phase}/{k}": float(v) for k, v in scalars.items()}}
        self._log_f.write(json.dumps(rec) + "\n")
        self._log_f.flush()

    def _ensure_optimizer(self, params):
        if self.optimizer is None:
            self.optimizer = make_optimizer(
                lr=self.cfg.lr, total_steps=self.cfg.max_steps,
                weight_decay=self.cfg.weight_decay,
                mask=trainable_mask(params, self.model_cfg),
            )
        return self.optimizer

    def save(self, params, opt_state, step: int):
        path = os.path.join(self.cfg.out_dir, f"ckpt_{step:07d}")
        checkpoint_io.save(path, {"params": params, "opt_state": opt_state, "step": step})
        return path

    def restore(self, path: str, params_like, opt_state_like=None):
        """Resume from a Trainer checkpoint: returns (params, opt_state, step)."""
        if opt_state_like is None:
            opt_state_like = self._ensure_optimizer(params_like).init(params_like)
        tree = checkpoint_io.load(
            path, like={"params": params_like, "opt_state": opt_state_like, "step": 0}
        )
        return tree["params"], tree["opt_state"], int(tree["step"])

    def fit(
        self,
        params: Dict,
        train_iter: Iterable[Dict],
        val_iter: Optional[Callable[[], Iterable[Dict]]] = None,
        opt_state=None,
        start_step: int = 0,
    ):
        self._ensure_optimizer(params)
        if opt_state is None:
            opt_state = self.optimizer.init(params)
        step = start_step
        t0 = time.time()
        base_key = jax.random.PRNGKey(0)
        for batch in train_iter:
            if step >= self.cfg.max_steps:
                break
            if do_data_sanity_checks(batch):
                continue
            batch = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, str)}
            params, opt_state, loss, loss_dict = self._step(
                params, opt_state, batch, jax.random.fold_in(base_key, step)
            )
            step += 1
            if step % self.cfg.log_every == 0:
                scalars = {"loss": float(np.asarray(loss))}
                scalars.update({k: float(np.asarray(v)) for k, v in loss_dict.items()})
                scalars["steps_per_sec"] = self.cfg.log_every / max(time.time() - t0, 1e-9)
                t0 = time.time()
                self.log("train", step, scalars)
            if step % self.cfg.ckpt_every == 0:
                self.save(params, opt_state, step)
            if val_iter is not None and step % self.cfg.val_every == 0:
                self.validate(params, val_iter(), step=step)
        self.save(params, opt_state, step)
        return params, opt_state, step

    def validate(self, params: Dict, val_iter: Iterable[Dict], step: int = 0, phase: str = "val"):
        fwd = self._fwd
        agg: Dict[str, list] = {}
        n = 0
        for batch in val_iter:
            jb = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, str)}
            out = fwd(params, jb)
            if self.metrics_fn is not None:
                m, _ = self.metrics_fn(jb, out)
                for k, v in m.items():
                    agg.setdefault(k, []).append(float(np.asarray(v)))
            n += 1
        scalars = {k: float(np.mean(v)) for k, v in agg.items()}
        scalars["num_batches"] = n
        self.log(phase, step, scalars)
        return scalars

    def predict(self, params: Dict, data_iter: Iterable[Dict]):
        fwd = self._fwd
        for batch in data_iter:
            jb = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, str)}
            yield {k: np.asarray(v) for k, v in fwd(params, jb).items()}
