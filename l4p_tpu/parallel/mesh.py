"""Device mesh + sharding rules.

The reference has no distributed code at all (SURVEY.md section 2.10); this
module is the TPU-native scaling design: a (data, model) mesh where

  * `data` shards the batch (and, at inference, the embarrassingly parallel
    window axis — l4p_videomae.py:278-293's loop is data-parallel work);
  * `model` tensor-shards the encoder's attention heads and MLP hidden dim
    (1408-dim / 16-head / 6144-hidden ViT-giant), with XLA inserting the
    all-reduces over ICI.

Shardings are expressed as PartitionSpec trees over the param pytree and
applied with jax.device_put / with_sharding_constraint; pjit/GSPMD does the
rest. No hand-rolled collectives.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), "mesh must use all devices"
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def encoder_param_specs(params: Dict) -> Dict:
    """PartitionSpec tree for encoder params: TP over heads/hidden.

    blocks.* have a leading stacked-depth axis (dim 0); qkv/fc1 shard their
    output dim, proj/fc2 shard their input dim — the classic Megatron split,
    one all-reduce per block half.
    """
    specs = jax.tree.map(lambda _: P(), params)
    b = specs["blocks"]
    # qkv_w is (depth, 3, E, E): shard the head-aligned output-feature dim
    b["qkv_w"] = P(None, None, "model", None)
    b["q_bias"] = P(None, "model")
    b["v_bias"] = P(None, "model")
    b["proj_w"] = P(None, None, "model")
    b["fc1_w"] = P(None, "model", None)
    b["fc1_b"] = P(None, "model")
    b["fc2_w"] = P(None, None, "model")
    return specs


def l4p_param_specs(params: Dict) -> Dict:
    """Full-model spec tree: encoder TP-sharded, heads replicated (they are
    <2% of params)."""
    specs = jax.tree.map(lambda _: P(), params)
    specs["video_encoder"] = encoder_param_specs(params["video_encoder"])
    return specs


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    specs = l4p_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: not isinstance(x, dict) and not isinstance(x, (list, tuple)),
    )


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for input pytrees."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
