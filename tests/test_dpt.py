"""Golden parity: l4p_tpu DPT decoder vs the reference PixelwiseTaskWithDPT."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tests.oracle import reference_path
from l4p_tpu.checkpoint import convert_dpt, state_dict_to_numpy
from l4p_tpu.models.dpt import DPTConfig, dpt_apply, init_dpt_params

reference_path()

from l4p.models.task_heads.dpt.dust3r.dpt_head import PixelwiseTaskWithDPT  # noqa: E402

# small-but-structurally-faithful config: 64-dim tokens, 8x28x28 video
SMALL = DPTConfig(
    num_channels=2,
    hooks=(1, 2, 3, 4),
    layer_dims=(16, 24, 32, 32),
    feature_dim=16,
    last_dim=8,
    dim_tokens=64,
    patch_size=(2, 14, 14),
)
SMALL_IMG = (8, 28, 28)  # -> token grid (4, 2, 2)

CAMRAY_SMALL = DPTConfig(
    num_channels=6,
    hooks=(1, 2, 3, 4),
    layer_dims=(16, 24, 32, 32),
    feature_dim=16,
    last_dim=8,
    dim_tokens=64,
    actpost_scale_factors=((1, 0, 0), (1, 0, 0), (0, 0, 0), (-1, -1, -1)),
    fusion_scale_factors=((1, 1, 1), (1, 1, 1), (2, 1, 1), (2, 2, 2)),
    output_size=(8, 2, 2),
)


def make_ref_dpt(cfg: DPTConfig, seed=0):
    torch.manual_seed(seed)
    m = PixelwiseTaskWithDPT(
        num_channels=cfg.num_channels,
        feature_dim=cfg.feature_dim,
        last_dim=cfg.last_dim,
        hooks_idx=list(cfg.hooks),
        layer_dims=list(cfg.layer_dims),
        dim_tokens=[cfg.dim_tokens] * 4,
        is_use_conv3d=True,
        head_type="regression",
        actpost_scale_factors=cfg.actpost_scale_factors,
        fusion_scale_factors=cfg.fusion_scale_factors,
        output_size=cfg.output_size,
        patch_size=cfg.patch_size,
    )
    m.eval()
    return m


@pytest.mark.parametrize("cfg,img", [(SMALL, SMALL_IMG), (CAMRAY_SMALL, SMALL_IMG)])
def test_dpt_parity(cfg, img):
    ref = make_ref_dpt(cfg)
    rng = np.random.default_rng(0)
    T, H, W = img
    nt, nh, nw = T // 2, H // 14, W // 14
    P = nt * nh * nw
    # feature list indexed by hooks — populate all indices
    feats = [rng.standard_normal((2, P, cfg.dim_tokens)).astype(np.float32) for _ in range(max(cfg.hooks) + 1)]
    with torch.no_grad():
        out_ref = ref([torch.from_numpy(f) for f in feats], img_info=img)

    params = convert_dpt(state_dict_to_numpy(ref.state_dict()), cfg, prefix="")
    hook_feats = [jnp.asarray(feats[h]) for h in cfg.hooks]
    out = dpt_apply(params, hook_feats, cfg, img_info=img)
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), rtol=2e-4, atol=2e-4)


def test_dpt_init_runs():
    import jax

    params = init_dpt_params(SMALL, jax.random.PRNGKey(0))
    feats = [jnp.zeros((1, 4 * 2 * 2, 64)) for _ in range(4)]
    out = dpt_apply(params, feats, SMALL, img_info=SMALL_IMG)
    assert out.shape == (1, 2, *SMALL_IMG)
