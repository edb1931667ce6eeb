"""Golden regression: the tiny all-task pipeline's outputs are pinned to a
committed fixture, catching silent behavior drift across refactors/rounds.

Regenerate intentionally with:
    L4P_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py -q
"""

import os

import numpy as np
import pytest

import jax

from l4p_tpu.config import init_l4p_params
from l4p_tpu.models.l4p import l4p_forward
from tests.test_l4p_forward import ALL_TASKS, make_data, tiny_cfg

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_all_task.npz")


def compute_outputs():
    cfg = tiny_cfg()
    params = init_l4p_params(cfg, jax.random.PRNGKey(0))
    data = make_data(T=8, N=5)
    out = l4p_forward(params, cfg, data, ALL_TASKS, key=jax.random.PRNGKey(0))
    return {k: np.asarray(v, np.float32) for k, v in out.items()}


def test_golden_outputs_unchanged():
    out = compute_outputs()
    if os.environ.get("L4P_REGEN_GOLDEN") or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, **out)
        if not os.environ.get("L4P_REGEN_GOLDEN"):
            pytest.skip("golden fixture created; rerun to compare")
        return
    ref = np.load(GOLDEN)
    assert set(ref.files) == set(out), f"output keys changed: {sorted(out)} vs {sorted(ref.files)}"
    for k in ref.files:
        np.testing.assert_allclose(
            out[k], ref[k], rtol=1e-4, atol=1e-4,
            err_msg=f"{k} drifted from the committed golden — if intentional, "
                    f"regenerate with L4P_REGEN_GOLDEN=1 and explain in the commit",
        )
