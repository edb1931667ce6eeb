"""Orbax-backed checkpoint save/load + the torch->orbax conversion utility.

The reference relies on Lightning .ckpt files (reference
l4p/models/utils.py:52-53); here checkpoints are orbax directories of the
param pytree. `convert_torch_ckpt` is the one-time converter for released
PyTorch weights (SURVEY.md section 5 item 4 deliverable).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save(path: str, tree: Dict[str, Any]) -> str:
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load(path: str, like: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if like is not None:
        return ckptr.restore(path, target=like)
    return ckptr.restore(path)


def convert_torch_ckpt(
    torch_ckpt_path: str,
    out_path: str,
    model_config_path: str = "configs/model.yaml",
    dtype=None,
) -> str:
    """One-time torch .ckpt -> orbax conversion (keyed off state_dict names,
    l4p/models/utils.py:52)."""
    import jax.numpy as jnp
    import torch

    from l4p_tpu.config import convert_l4p, load_model_config

    cfg, _ = load_model_config(model_config_path)
    ckpt = torch.load(torch_ckpt_path, map_location="cpu", weights_only=True)
    params = convert_l4p(ckpt["state_dict"], cfg, dtype or jnp.float32)
    return save(out_path, {"params": params})
