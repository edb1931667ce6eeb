"""Fused SAM two-way-transformer image-side passes as Pallas TPU kernels.

The two-way transformer (models/sam.py, replacing the reference
sam/transformer.py:21-245 hot loop driven from sparse_heads.py:277-486) is
HBM-bound in XLA on its image side: the keys tensor is (N, P, C) = 369 MB
bf16 at N=64 (P=2048 video tokens, C=1408), and every layer runs eight
projections, two cross-attentions, a residual and a LayerNorm over it —
~4.3 GB of HBM round-trips per layer for ~13 ms of roofline FLOPs. Measured
33 ms per tracked window against a ~13 ms roofline (ROUND_NOTES round 2).

Two kernels remove the round-trips; each reads the keys exactly once:

* `t2i_attention` (kernel A): token->image cross-attention. Projects k and v
  from the keys tile in VMEM and feeds them straight into a flash-style
  online softmax over image-token tiles — the (N, P, 704) k/v tensors never
  reach HBM. The tiny per-head queries are packed into a block-diagonal
  (704, H*Q) matrix so ONE matmul emits every (head, query) logit column;
  the accumulator is (704, H*Q) whose per-head diagonal blocks are extracted
  after the kernel (cross-head terms are never normalized or used).

* `i2t_block` (kernel B): the full image-side half-layer — q-projection
  (+ positional bias), softmax over the Q=6 token keys, out-projection,
  residual add, LayerNorm — per keys tile, one read + one write. The
  per-head softmax over interleaved (head, token) logit columns uses a
  group-mask matmul: with one shared row-max (valid — any per-row constant
  cancels in the softmax ratio), the per-head denominator is exp @ Gmask
  where Gmask[i,j] = [head(i) == head(j)].

Differentiable via custom_vjp: forward runs the kernel, backward re-derives
gradients through the identical XLA reference implementation (same recompute
pattern as ops/flash_attention.py and ops/fused_upscale.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# shared packing helpers
# ---------------------------------------------------------------------------

def _block_diag_rows(x_nqhd: jnp.ndarray) -> jnp.ndarray:
    """(N, Q, H, hd) -> (N, H*hd, H*Q): M[n, h*hd+d, h*Q+q] = x[n, q, h, d],
    zero off the per-head diagonal blocks."""
    n, q, h, hd = x_nqhd.shape
    eye = jnp.eye(h, dtype=x_nqhd.dtype)
    m = jnp.einsum("nqhd,hg->nhdgq", x_nqhd, eye)
    return m.reshape(n, h * hd, h * q)


def _block_diag_cols(x_nqhd: jnp.ndarray) -> jnp.ndarray:
    """(N, Q, H, hd) -> (N, H*Q, H*hd): M[n, h*Q+q, h*hd+d] = x[n, q, h, d]."""
    n, q, h, hd = x_nqhd.shape
    eye = jnp.eye(h, dtype=x_nqhd.dtype)
    m = jnp.einsum("nqhd,hg->nhqgd", x_nqhd, eye)
    return m.reshape(n, h * q, h * hd)


def _split_heads(x_nqd: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    n, q, d = x_nqd.shape
    return x_nqd.reshape(n, q, num_heads, d // num_heads)


def fused_twoway_available(keys: jnp.ndarray) -> bool:
    """Single real TPU device with tile-friendly shapes (CPU tests and
    sharded meshes take the XLA path, same gating as the other kernels)."""
    from l4p_tpu.ops.flash_attention import _on_tpu, _single_device

    n, p, c = keys.shape
    return _on_tpu() and _single_device() and p % 256 == 0 and c % 128 == 0


# ---------------------------------------------------------------------------
# kernel A: token->image cross-attention (k/v projection fused into flash)
# ---------------------------------------------------------------------------

def _t2i_kernel(keys_ref, wk_ref, pek_ref, wv_ref, bv_ref, qbd_ref,
                out_ref, m_ref, l_ref, acc_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x0 = keys_ref[0]  # (BP, C) bf16
    # projections stay in VMEM; pek already folds the k bias and the
    # projected image positional encoding (proj is linear: proj(x + pe) ==
    # proj(x) + proj(pe), see models/sam.py _attn_apply)
    k_t = jnp.dot(x0, wk_ref[:], preferred_element_type=jnp.float32)
    k_t = (k_t + pek_ref[:].astype(jnp.float32)).astype(x0.dtype)
    v_t = jnp.dot(x0, wv_ref[:], preferred_element_type=jnp.float32)
    v_t = (v_t + bv_ref[:].astype(jnp.float32)).astype(x0.dtype)

    # (BP, H*Q) logits: one matmul against the block-diagonal queries
    logits = jnp.dot(k_t, qbd_ref[0], preferred_element_type=jnp.float32)

    m_tile = jnp.max(logits, axis=0, keepdims=True)  # (1, HQ)
    m_new = jnp.maximum(m_ref[:], m_tile)
    alpha = jnp.exp(m_ref[:] - m_new)
    p_e = jnp.exp(logits - m_new)  # (BP, HQ), <= 1
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p_e, axis=0, keepdims=True)
    # acc (D, HQ): columns scale with alpha; contribution contracts the
    # token-block axis of both operands
    contrib = lax.dot_general(
        v_t, p_e.astype(x0.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] = acc_ref[:] * alpha + contrib
    m_ref[:] = m_new

    @pl.when(j == nj - 1)
    def _():
        out_ref[0] = acc_ref[:] / l_ref[:]


def _t2i_xla(keys, q_nqd, wk, bk, wv, bv, pe_pc, num_heads):
    """XLA reference: exactly the models/sam.py _attn_apply inner attention
    (projections + mha) for the token->image direction."""
    from l4p_tpu.ops.attention import mha
    from l4p_tpu.ops.conv import linear

    k = linear(keys, wk, bk) + linear(pe_pc[None], wk, None).astype(keys.dtype)
    v = linear(keys, wv, bv)
    n, p, d = k.shape
    q = q_nqd
    nq = q.shape[1]
    hd = d // num_heads
    qh = q.reshape(n, nq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(n, p, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(n, p, num_heads, hd).transpose(0, 2, 1, 3)
    out = mha(qh, kh, vh, scale=hd ** -0.5)
    return out.transpose(0, 2, 1, 3).reshape(n, nq, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def t2i_attention(keys, q_nqd, wk, bk, wv, bv, pe_pc,
                  num_heads: int, interpret: bool = False):
    """Token->image cross-attention, k/v projected in-kernel.

    keys: (N, P, C); q_nqd: (N, Q, D) already projected (+PE) queries;
    wk/wv: (D, C) torch-layout; pe_pc: (P, C) raw image positional encoding
    (pre-projection). Returns the mha output (N, Q, D) — out_proj is the
    caller's (token-side, tiny).
    """
    return _t2i_impl(keys, q_nqd, wk, bk, wv, bv, pe_pc, num_heads, interpret)


def _t2i_impl(keys, q_nqd, wk, bk, wv, bv, pe_pc, num_heads, interpret):
    n, p, c = keys.shape
    nq, d = q_nqd.shape[1], wk.shape[0]
    hd = d // num_heads
    hq = num_heads * nq
    dtype = keys.dtype

    # fold k bias + projected PE into one (P, D) additive term
    pek = (pe_pc.astype(jnp.float32) @ wk.astype(jnp.float32).T
           + bk.astype(jnp.float32)).astype(dtype)
    qbd = _block_diag_rows(_split_heads(q_nqd * (hd ** -0.5), num_heads)).astype(dtype)

    bp = next((b for b in (512, 256, 128) if p % b == 0), p)
    grid = (n, p // bp)
    out = pl.pallas_call(
        _t2i_kernel,
        out_shape=jax.ShapeDtypeStruct((n, d, hq), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bp, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((c, d), lambda i, j: (0, 0)),
            pl.BlockSpec((bp, d), lambda i, j: (j, 0)),
            pl.BlockSpec((c, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d, hq), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, hq), lambda i, j: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, hq), jnp.float32),
            pltpu.VMEM((1, hq), jnp.float32),
            pltpu.VMEM((d, hq), jnp.float32),
        ],
        interpret=interpret,
    )(keys, wk.T.astype(dtype), pek, wv.T.astype(dtype),
      bv.reshape(1, d).astype(dtype), qbd)

    # extract per-head diagonal blocks: out[n, h*hd+d_, h*Q+q] -> (N, Q, D)
    eye = jnp.eye(num_heads, dtype=out.dtype)
    o = out.reshape(n, num_heads, hd, num_heads, nq)
    o = jnp.einsum("nhdgq,hg->nqhd", o, eye)
    return o.reshape(n, nq, d).astype(dtype)


def _t2i_fwd(keys, q_nqd, wk, bk, wv, bv, pe_pc, num_heads, interpret):
    out = _t2i_impl(keys, q_nqd, wk, bk, wv, bv, pe_pc, num_heads, interpret)
    return out, (keys, q_nqd, wk, bk, wv, bv, pe_pc)


def _t2i_bwd(num_heads, interpret, res, g):
    _, vjp = jax.vjp(lambda *a: _t2i_xla(*a, num_heads), *res)
    return vjp(g)


t2i_attention.defvjp(_t2i_fwd, _t2i_bwd)


# ---------------------------------------------------------------------------
# kernel B: image->token half-layer (q proj + 6-key softmax + out proj +
# residual + LayerNorm), one keys read, one keys write
# ---------------------------------------------------------------------------

def _i2t_kernel(keys_ref, wq_ref, peq_ref, kbd_ref, gmask_ref, vbd_ref,
                wout_ref, bout_ref, lnw_ref, lnb_ref, out_ref, *, eps: float):
    x0 = keys_ref[0]  # (BP, C) bf16
    q_t = jnp.dot(x0, wq_ref[:], preferred_element_type=jnp.float32)
    q_t = (q_t + peq_ref[:].astype(jnp.float32)).astype(x0.dtype)

    # (BP, H*Q) logits against block-diagonal token keys (scale folded in)
    logits = jnp.dot(q_t, kbd_ref[0], preferred_element_type=jnp.float32)
    # softmax per head-group of Q columns; one shared row-max is valid
    # (any per-row constant cancels in the ratio), and the per-head
    # denominator is a matmul with the head-group mask
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.dot(e, gmask_ref[:], preferred_element_type=jnp.float32)
    w = (e / s).astype(x0.dtype)
    # (BP, D): block-diagonal v rows land each head's sum in its own block
    o = jnp.dot(w, vbd_ref[0], preferred_element_type=jnp.float32).astype(x0.dtype)
    attn = jnp.dot(o, wout_ref[:], preferred_element_type=jnp.float32)
    attn = (attn + bout_ref[:].astype(jnp.float32)).astype(x0.dtype)

    x = (x0 + attn).astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    y = y * lnw_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    out_ref[0] = y.astype(x0.dtype)


def _i2t_xla(keys, k_tok, v_tok, wq, bq, pe_pc, wout, bout, ln_w, ln_b,
             num_heads, eps):
    """XLA reference: models/sam.py cross_attn_image_to_token + residual +
    norm4 (sam/transformer.py:180-186)."""
    from l4p_tpu.ops.attention import mha
    from l4p_tpu.ops.conv import layer_norm, linear

    q = linear(keys, wq, bq) + linear(pe_pc[None], wq, None).astype(keys.dtype)
    n, p, d = q.shape
    nk = k_tok.shape[1]
    hd = d // num_heads
    qh = q.reshape(n, p, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k_tok.reshape(n, nk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v_tok.reshape(n, nk, num_heads, hd).transpose(0, 2, 1, 3)
    out = mha(qh, kh, vh, scale=hd ** -0.5)
    out = out.transpose(0, 2, 1, 3).reshape(n, p, d)
    attn = linear(out, wout, bout)
    return layer_norm(keys + attn, ln_w, ln_b, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def i2t_block(keys, k_tok, v_tok, wq, bq, pe_pc, wout, bout, ln_w, ln_b,
              num_heads: int, eps: float = 1e-5, interpret: bool = False):
    """Image->token cross-attention + residual + LayerNorm, fused per tile.

    keys: (N, P, C); k_tok/v_tok: (N, Q, D) token-side projections (+PE on k)
    done by the caller; wq/wout torch-layout; pe_pc: (P, C) raw image PE.
    Returns the new keys (N, P, C).
    """
    return _i2t_impl(keys, k_tok, v_tok, wq, bq, pe_pc, wout, bout, ln_w,
                     ln_b, num_heads, eps, interpret)


def _i2t_impl(keys, k_tok, v_tok, wq, bq, pe_pc, wout, bout, ln_w, ln_b,
              num_heads, eps, interpret):
    n, p, c = keys.shape
    nq, d = k_tok.shape[1], wq.shape[0]
    hd = d // num_heads
    hq = num_heads * nq
    dtype = keys.dtype

    peq = (pe_pc.astype(jnp.float32) @ wq.astype(jnp.float32).T
           + bq.astype(jnp.float32)).astype(dtype)
    kbd = _block_diag_rows(_split_heads(k_tok * (hd ** -0.5), num_heads)).astype(dtype)
    vbd = _block_diag_cols(_split_heads(v_tok, num_heads)).astype(dtype)
    gmask = np.kron(np.eye(num_heads, dtype=np.float32), np.ones((nq, nq), np.float32))

    bp = next((b for b in (256, 128) if p % b == 0), p)
    grid = (n, p // bp)
    out = pl.pallas_call(
        functools.partial(_i2t_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, p, c), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bp, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((c, d), lambda i, j: (0, 0)),
            pl.BlockSpec((bp, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, d, hq), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((hq, hq), lambda i, j: (0, 0)),
            pl.BlockSpec((1, hq, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((d, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bp, c), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(keys, wq.T.astype(dtype), peq, kbd, jnp.asarray(gmask), vbd,
      wout.T.astype(dtype), bout.reshape(1, c).astype(dtype),
      ln_w.reshape(1, c), ln_b.reshape(1, c))
    return out


def _i2t_fwd(keys, k_tok, v_tok, wq, bq, pe_pc, wout, bout, ln_w, ln_b,
             num_heads, eps, interpret):
    out = _i2t_impl(keys, k_tok, v_tok, wq, bq, pe_pc, wout, bout, ln_w,
                    ln_b, num_heads, eps, interpret)
    return out, (keys, k_tok, v_tok, wq, bq, pe_pc, wout, bout, ln_w, ln_b)


def _i2t_bwd(num_heads, eps, interpret, res, g):
    _, vjp = jax.vjp(lambda *a: _i2t_xla(*a, num_heads, eps), *res)
    return vjp(g)


i2t_block.defvjp(_i2t_fwd, _i2t_bwd)
