"""Parity tests: l4p_tpu.ops vs torch (CPU) ground truth."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from l4p_tpu.ops import conv as jconv
from l4p_tpu.ops import misc as jmisc
from l4p_tpu.ops import resize as jresize
from l4p_tpu.ops.attention import mha

RNG = np.random.default_rng(0)


def t2n(t):
    return t.detach().cpu().numpy()


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_size,out_size",
    [((8, 16, 16), (16, 128, 128)), ((16, 128, 128), (16, 224, 224)), ((7, 9, 11), (3, 20, 5))],
)
def test_trilinear_resize(align_corners, in_size, out_size):
    x = RNG.standard_normal((1, 2, *in_size)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=out_size, mode="trilinear", align_corners=align_corners)
    out = jresize.interpolate_trilinear(jnp.asarray(x), out_size, align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(out), t2n(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("scale", [(2, 2, 2), (1, 2, 2), (2, 1, 1), (1, 1, 1)])
def test_trilinear_scale_factor(align_corners, scale):
    x = RNG.standard_normal((1, 4, 4, 8, 8)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), scale_factor=scale, mode="trilinear", align_corners=align_corners
    )
    out = jresize.interpolate_scale(jnp.asarray(x), scale, align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(out), t2n(ref), rtol=1e-5, atol=1e-5)


def test_linear_1d_resize():
    x = RNG.standard_normal((2, 96, 16)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=8, mode="linear")
    out = jresize.resize_linear(jnp.asarray(x), (8,), (2,), align_corners=False)
    np.testing.assert_allclose(np.asarray(out), t2n(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,s,p",
    [(4, 8, 3, 1, 1), (4, 8, 1, 1, 0), (3, 16, (2, 14, 14), (2, 14, 14), 0), (8, 4, 3, 2, 1)],
)
def test_conv3d(cin, cout, k, s, p):
    tconv = torch.nn.Conv3d(cin, cout, k, stride=s, padding=p)
    x = RNG.standard_normal((2, cin, 4, 28, 28)).astype(np.float32)
    ref = tconv(torch.from_numpy(x))
    out = jconv.conv3d(
        jnp.asarray(x), jnp.asarray(t2n(tconv.weight)), jnp.asarray(t2n(tconv.bias)), stride=s, padding=p
    )
    np.testing.assert_allclose(np.asarray(out), t2n(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("cin,cout,k,s", [(8, 4, 2, 2), (8, 4, (1, 2, 2), (1, 2, 2)), (6, 6, (2, 4, 4), (2, 4, 4))])
def test_conv_transpose3d(cin, cout, k, s):
    tconv = torch.nn.ConvTranspose3d(cin, cout, k, stride=s)
    x = RNG.standard_normal((2, cin, 4, 8, 8)).astype(np.float32)
    ref = tconv(torch.from_numpy(x))
    out = jconv.conv_transpose3d(
        jnp.asarray(x), jnp.asarray(t2n(tconv.weight)), jnp.asarray(t2n(tconv.bias)), stride=s
    )
    np.testing.assert_allclose(np.asarray(out), t2n(ref), rtol=1e-4, atol=1e-4)


def test_linear_layernorm_gelu():
    lin = torch.nn.Linear(32, 48)
    ln = torch.nn.LayerNorm(32, eps=1e-6)
    x = RNG.standard_normal((2, 5, 32)).astype(np.float32)
    xt = torch.from_numpy(x)
    np.testing.assert_allclose(
        np.asarray(jconv.linear(jnp.asarray(x), jnp.asarray(t2n(lin.weight)), jnp.asarray(t2n(lin.bias)))),
        t2n(lin(xt)),
        rtol=1e-5,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jconv.layer_norm(jnp.asarray(x), jnp.asarray(t2n(ln.weight)), jnp.asarray(t2n(ln.bias)))),
        t2n(ln(xt)),
        rtol=1e-5,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jconv.gelu(jnp.asarray(x))), t2n(F.gelu(xt)), rtol=1e-5, atol=1e-5
    )


def test_mha_matches_torch():
    B, H, N, D = 2, 4, 32, 16
    q = RNG.standard_normal((B, H, N, D)).astype(np.float32)
    k = RNG.standard_normal((B, H, N, D)).astype(np.float32)
    v = RNG.standard_normal((B, H, N, D)).astype(np.float32)
    ref = F.scaled_dot_product_attention(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v))
    out = mha(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), t2n(ref), rtol=1e-4, atol=1e-4)


def test_misc_fns():
    x = RNG.standard_normal((4, 5)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(jmisc.apply_fn(jnp.asarray(x), "exp")), np.exp(x), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jmisc.apply_fn(jnp.asarray(x), "sigmoid")),
        t2n(torch.sigmoid(torch.from_numpy(x))),
        rtol=1e-5,
        atol=1e-6,
    )
    # safe_inverse zeroes non-positive entries (reference misc.py:48-62)
    inv = np.asarray(jmisc.safe_inverse(jnp.asarray(x)))
    expect = np.where(x > 0, 1.0 / np.where(x > 0, x, 1.0), 0.0)
    np.testing.assert_allclose(inv, expect, rtol=1e-6)
    found, bad = jmisc.check_inf_nan(jnp.asarray(np.array([1.0, np.nan, np.inf])))
    assert bool(found) and np.asarray(bad).tolist() == [False, True, True]
