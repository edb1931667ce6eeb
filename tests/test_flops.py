"""Sanity checks on the analytic FLOPs model (utils/flops.py)."""

import numpy as np

from l4p_tpu.models.encoder import EncoderConfig
from l4p_tpu.models.l4p import L4PConfig
from l4p_tpu.models.track import TrackConfig
from l4p_tpu.utils.flops import (
    alltask_video_flops,
    dpt_head_flops,
    encoder_window_flops,
    mfu,
    num_windows,
    track_window_flops,
)


def test_encoder_giant_window_flops():
    """Hand-derived giant window: 40 blocks x (qkv 24.36 + attn 23.62 +
    proj 8.12 + mlp 70.87) GFLOP + patchify 6.78 GFLOP = 5.086 TFLOP."""
    f = encoder_window_flops(EncoderConfig())
    assert abs(f - 5.086e12) / 5.086e12 < 0.01, f


def test_dpt_flops_camray_much_cheaper():
    cfg = L4PConfig()
    heads = cfg.head_dict
    f_flow = dpt_head_flops(heads["flow_2d_backward"].dpt)
    f_cam = dpt_head_flops(heads["camray"].dpt)
    # the full-res heads are TFLOP-scale; the 16^3-output camray head is not
    assert 1.5e12 < f_flow < 4e12, f_flow
    assert f_cam < 0.15 * f_flow, (f_cam, f_flow)


def test_track_window_flops_linear_in_queries():
    tcfg = TrackConfig()
    f64 = track_window_flops(tcfg, 64)
    f128 = track_window_flops(tcfg, 128)
    np.testing.assert_allclose(f128, 2 * f64, rtol=1e-9)
    # upscale chain dominates: ~2/3 of the window at any N
    assert 25e9 < f64 / 64 < 40e9, f64 / 64


def test_alltask_video_composition():
    cfg = L4PConfig()
    tasks = ("flow_2d_backward", "track_2d", "depth", "dyn_mask", "camray")
    st = alltask_video_flops(cfg, tasks, 192, 128)
    assert num_windows(192) == 23
    keys = {"encoder", "dense/flow_2d_backward", "dense/depth", "dense/dyn_mask",
            "dense/camray", "track", "total"}
    assert keys == set(st.keys())
    np.testing.assert_allclose(
        st["total"], sum(v for k, v in st.items() if k != "total"), rtol=1e-12
    )
    # whole headline video: order 3e14 FLOP (23 windows x ~15 TFLOP)
    assert 2e14 < st["total"] < 5e14, st["total"]
    # query chunking: 129 queries -> 2 chunks of 128 -> ~2x track flops
    st2 = alltask_video_flops(cfg, tasks, 192, 129)
    np.testing.assert_allclose(st2["track"], 2 * st["track"], rtol=1e-9)


def test_mfu_basic():
    assert mfu(1e12, 1.0, None) is None
    assert abs(mfu(98.5e12, 1.0, 197e12) - 0.5) < 1e-9
