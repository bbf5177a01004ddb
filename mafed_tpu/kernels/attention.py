"""Attention for TPU: Pallas flash-attention kernel + XLA reference path.

Replaces the reference's external flash-attn-2 CUDA dependency
(reference README.md:16; enabled at mafed/model/vl_pythia.py:392-397) with an
in-repo Pallas kernel. One kernel serves both uses:

  * GPT-NeoX decoder: causal over [256 vision prefix + text], with a
    key-padding mask for left-padded text (mafed/model/vl_pythia.py:281-292).
  * EVA-02 ViT encoder: non-causal, no mask.

Layout convention: q, k, v are [batch, heads, seq, head_dim].

Forward is a blockwise online-softmax flash kernel: the grid iterates
(batch*heads, q_blocks); each program streams k/v blocks through VMEM with
running max/sum rescaling (no [T, T] score matrix in HBM); causal q-blocks
skip fully-masked k-blocks. It additionally emits the per-row log-sum-exp,
and a jax.custom_vjp supplies the standard flash backward from (o, lse)
residuals — so the same kernel serves training and inference. KV-cache
decode (traced causal offset) and CPU runs use the XLA reference path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_INTERPRET = False  # flipped by tests on CPU

_NEG = float(np.finfo(np.float32).min)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# XLA reference implementation (also the KV-cache/decode path)
# ---------------------------------------------------------------------------

def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    key_padding_mask: Optional[jax.Array] = None,
    causal: bool = False,
    causal_offset=None,
    scale: Optional[float] = None,
) -> jax.Array:
    """Masked softmax attention via plain XLA ops. [B, H, T, D] layout."""
    _, _, q_len, head_dim = q.shape
    k_len = k.shape[2]
    scale = (head_dim ** -0.5) if scale is None else scale
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32)
    if causal:
        # offset aligns the causal diagonal: query row i sits at absolute
        # position offset+i in the key sequence. Defaults to q-as-suffix-of-k;
        # KV-cache prefill passes the (traced) cache length instead.
        offset = (k_len - q_len) if causal_offset is None else causal_offset
        qi = jnp.arange(q_len)[:, None]
        ki = jnp.arange(k_len)[None, :]
        scores = jnp.where((ki <= qi + offset)[None, None], scores, _NEG)
    if key_padding_mask is not None:
        keep = key_padding_mask[:, None, None, :].astype(bool)
        scores = jnp.where(keep, scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------------------
# Pallas flash attention forward kernel
# ---------------------------------------------------------------------------

def _flash_kernel(
    mask_ref,  # [1, 1, k_len] int32 key-padding
    q_ref,     # [1, block_q, head_dim]
    k_ref,     # [1, k_len, head_dim]
    v_ref,     # [1, k_len, head_dim]
    o_ref,     # [1, block_q, head_dim]
    lse_ref,   # [1, block_q, 1] float32 log-sum-exp (inf for empty rows)
    *,
    causal: bool,
    scale: float,
    block_k: int,
    kv_len: int,
    use_mask: bool,
):
    from jax.experimental import pallas as pl

    block_q = q_ref.shape[1]
    head_dim = q_ref.shape[2]
    qi = pl.program_id(1)

    # keep matmul operands in the input dtype (bf16 on TPU -> full-rate MXU);
    # accumulate scores and the output in f32
    q = q_ref[0]  # [block_q, head_dim]

    num_k_blocks = pl.cdiv(kv_len, block_k)
    q_start = qi * block_q if causal else 0

    def body(ki_idx, carry):
        acc, m_prev, l_prev = carry
        k_start = ki_idx * block_k
        k_blk = k_ref[0, pl.ds(k_start, block_k), :]
        v_blk = v_ref[0, pl.ds(k_start, block_k), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale  # [bq, bk]

        keep = jnp.ones((block_q, block_k), bool)
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            keep = keep & (cols <= rows)
        if use_mask:
            kp = mask_ref[0, 0, pl.ds(k_start, block_k)] > 0
            keep = keep & kp[None, :]
        s = jnp.where(keep, s, _NEG)

        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        # explicit zeroing: when a row's keys are ALL masked, exp(s - m) would
        # be 1 (s == m == finfo.min), silently yielding uniform attention
        p = jnp.exp(s - m_new[:, None]) * keep.astype(jnp.float32)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, head_dim), jnp.float32)
    m0 = jnp.full((block_q,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)

    if causal:
        last_block = jax.lax.div(q_start + block_q - 1, block_k) + 1
        upper = jnp.minimum(last_block, num_k_blocks)
    else:
        upper = num_k_blocks
    acc, m_fin, l_fin = jax.lax.fori_loop(0, upper, body, (acc0, m0, l0))
    empty = l_fin == 0.0
    l_safe = jnp.where(empty, 1.0, l_fin)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    # lse = m + log(l); +inf for rows with no valid keys so exp(s - lse) = 0
    # in the backward pass (their outputs are zero and never consumed).
    lse = jnp.where(empty, jnp.inf, m_fin + jnp.log(l_safe))
    lse_ref[0] = lse[:, None]


def _flash_forward(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,  # [B, k_len] int32
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    use_mask: bool = True,
):
    from jax.experimental import pallas as pl

    batch, heads, q_len, head_dim = q.shape
    kv_len = k.shape[2]

    q_pad = (-q_len) % block_q
    k_pad = (-kv_len) % block_k
    # padded keys must be masked out even when the caller had no padding mask
    use_mask = use_mask or bool(k_pad)
    if k_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, k_pad)))
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad), (0, 0)))

    pq, pk = q_len + q_pad, kv_len + k_pad
    bh = batch * heads
    qm = q.reshape(bh, pq, head_dim)
    km = k.reshape(bh, pk, head_dim)
    vm = v.reshape(bh, pk, head_dim)
    maskm = jnp.repeat(mask.astype(jnp.int32), heads, axis=0)[:, None, :]  # [bh,1,pk]

    from jax.experimental.pallas import tpu as pltpu

    grid = (bh, pq // block_q)
    kernel = functools.partial(
        _flash_kernel,
        causal=causal, scale=scale, block_k=block_k, kv_len=pk, use_mask=use_mask,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        in_specs=[
            pl.BlockSpec((1, 1, pk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, head_dim), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, pk, head_dim), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, pk, head_dim), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, head_dim), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, pq, head_dim), q.dtype),
            jax.ShapeDtypeStruct((bh, pq, 1), jnp.float32),
        ),
        interpret=_INTERPRET,
    )(maskm, qm, km, vm)

    out = out.reshape(batch, heads, pq, head_dim)[:, :, :q_len]
    lse = lse.reshape(batch, heads, pq)[:, :, :q_len]
    return out, lse


# ---------------------------------------------------------------------------
# Pallas flash attention backward kernels
# ---------------------------------------------------------------------------

def _flash_bwd_dkv_kernel(
    mask_ref,   # [1, 1, pk]
    q_ref,      # [1, pq, d]
    k_ref,      # [1, bk, d]   (this program's key block)
    v_ref,      # [1, bk, d]
    do_ref,     # [1, pq, d]
    lse_ref,    # [1, pq, 1] f32
    delta_ref,  # [1, pq, 1] f32  rowsum(do * o)
    dk_ref,     # [1, bk, d]
    dv_ref,     # [1, bk, d]
    *,
    causal: bool,
    scale: float,
    block_q: int,
    q_len: int,
    use_mask: bool,
):
    from jax.experimental import pallas as pl

    ki = pl.program_id(1)
    block_k = k_ref.shape[1]
    d = k_ref.shape[2]
    k_start = ki * block_k
    k_blk = k_ref[0]
    v_blk = v_ref[0]
    kp = mask_ref[0, 0, pl.ds(k_start, block_k)] > 0 if use_mask else None

    num_q_blocks = pl.cdiv(q_len, block_q)
    # causal: rows with q_pos < k_start contribute nothing to this key block
    first_q = jax.lax.div(k_start, block_q) if causal else 0

    def body(qi, carry):
        dk_acc, dv_acc = carry
        q_start = qi * block_q
        q_b = q_ref[0, pl.ds(q_start, block_q), :]
        do_b = do_ref[0, pl.ds(q_start, block_q), :]
        lse_b = lse_ref[0, pl.ds(q_start, block_q), 0]
        delta_b = delta_ref[0, pl.ds(q_start, block_q), 0]

        s = jnp.dot(q_b, k_blk.T, preferred_element_type=jnp.float32) * scale
        keep = jnp.ones((block_q, block_k), bool)
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            keep = keep & (cols <= rows)
        if use_mask:
            keep = keep & kp[None, :]
        # lse = +inf for empty rows -> p = 0 there
        p = jnp.exp(s - lse_b[:, None]) * keep.astype(jnp.float32)

        p_lp = p.astype(do_b.dtype)
        dv_acc = dv_acc + jnp.dot(p_lp.T, do_b, preferred_element_type=jnp.float32)
        dp = jnp.dot(do_b, v_blk.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta_b[:, None])
        ds_lp = ds.astype(q_b.dtype)
        dk_acc = dk_acc + jnp.dot(ds_lp.T, q_b, preferred_element_type=jnp.float32) * scale
        return dk_acc, dv_acc

    zeros = jnp.zeros((block_k, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(first_q, num_q_blocks, body, (zeros, zeros))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    mask_ref,   # [1, 1, pk]
    q_ref,      # [1, bq, d]  (this program's query block)
    k_ref,      # [1, pk, d]
    v_ref,      # [1, pk, d]
    do_ref,     # [1, bq, d]
    lse_ref,    # [1, bq, 1]
    delta_ref,  # [1, bq, 1]
    dq_ref,     # [1, bq, d]
    *,
    causal: bool,
    scale: float,
    block_k: int,
    kv_len: int,
    use_mask: bool,
):
    from jax.experimental import pallas as pl

    qi = pl.program_id(1)
    block_q = q_ref.shape[1]
    d = q_ref.shape[2]
    q_start = qi * block_q
    q_b = q_ref[0]
    do_b = do_ref[0]
    lse_b = lse_ref[0, :, 0]
    delta_b = delta_ref[0, :, 0]

    num_k_blocks = pl.cdiv(kv_len, block_k)
    if causal:
        last_block = jax.lax.div(q_start + block_q - 1, block_k) + 1
        upper = jnp.minimum(last_block, num_k_blocks)
    else:
        upper = num_k_blocks

    def body(ki, dq_acc):
        k_start = ki * block_k
        k_blk = k_ref[0, pl.ds(k_start, block_k), :]
        v_blk = v_ref[0, pl.ds(k_start, block_k), :]
        s = jnp.dot(q_b, k_blk.T, preferred_element_type=jnp.float32) * scale
        keep = jnp.ones((block_q, block_k), bool)
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            keep = keep & (cols <= rows)
        if use_mask:
            kp = mask_ref[0, 0, pl.ds(k_start, block_k)] > 0
            keep = keep & kp[None, :]
        p = jnp.exp(s - lse_b[:, None]) * keep.astype(jnp.float32)
        dp = jnp.dot(do_b, v_blk.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta_b[:, None])).astype(k_blk.dtype)
        return dq_acc + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32) * scale

    dq_acc = jax.lax.fori_loop(0, upper, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = dq_acc.astype(dq_ref.dtype)


def _flash_backward(
    q, k, v, mask, out, lse, g,
    *, causal: bool, scale: float, block_q: int, block_k: int, use_mask: bool = True,
):
    """Blockwise flash backward: dq via a q-block grid, dk/dv via a k-block
    grid; delta = rowsum(do * o) precomputed in XLA. No [T, T] tensor ever
    touches HBM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, heads, q_len, d = q.shape
    kv_len = k.shape[2]
    q_pad = (-q_len) % block_q
    k_pad = (-kv_len) % block_k
    use_mask = use_mask or bool(k_pad)
    pq, pk = q_len + q_pad, kv_len + k_pad

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # [b,h,q]

    def padq(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, q_pad), (0, 0))) if q_pad else x

    def padk(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, k_pad), (0, 0))) if k_pad else x

    bh = batch * heads
    qm = padq(q).reshape(bh, pq, d)
    km = padk(k).reshape(bh, pk, d)
    vm = padk(v).reshape(bh, pk, d)
    gm = padq(g).reshape(bh, pq, d)
    # pad lse with +inf so padded rows produce p = 0 in both kernels
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, q_pad)), constant_values=jnp.inf) if q_pad else lse
    lsem = lse_p.reshape(bh, pq, 1)
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, q_pad))) if q_pad else delta
    deltam = delta_p.astype(jnp.float32).reshape(bh, pq, 1)
    maskm = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, k_pad))) if k_pad else mask.astype(jnp.int32)
    maskm = jnp.repeat(maskm, heads, axis=0)[:, None, :]

    params = pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))

    dkv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel,
            causal=causal, scale=scale, block_q=block_q, q_len=pq, use_mask=use_mask,
        ),
        grid=(bh, pk // block_k),
        in_specs=[
            pl.BlockSpec((1, 1, pk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, pq, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, pq, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, pq, 1), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, pq, 1), lambda b, i: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, pk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, pk, d), v.dtype),
        ),
        compiler_params=params,
        interpret=_INTERPRET,
    )(maskm, qm, km, vm, gm, lsem, deltam)
    dk, dv = dkv

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel,
            causal=causal, scale=scale, block_k=block_k, kv_len=pk, use_mask=use_mask,
        ),
        grid=(bh, pq // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, pk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, pk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, pk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, pq, d), q.dtype),
        compiler_params=params,
        interpret=_INTERPRET,
    )(maskm, qm, km, vm, gm, lsem, deltam)

    dq = dq.reshape(batch, heads, pq, d)[:, :, :q_len]
    dk = dk.reshape(batch, heads, pk, d)[:, :, :kv_len]
    dv = dv.reshape(batch, heads, pk, d)[:, :, :kv_len]
    return dq, dk, dv


# backward implementation: "auto" = XLA recompute for short sequences (its
# [T, T] transients are cheap and measured faster at VQA lengths), pallas
# blockwise beyond 1024 keys (where XLA's transients are multi-GB);
# "always"/"never" force one side (tests use "always").
_PALLAS_BWD_MODE = "auto"
_PALLAS_BWD_KV_THRESHOLD = 1024


@functools.lru_cache(maxsize=32)
def _make_flash(causal: bool, scale: float, block_q: int, block_k: int, use_mask: bool = True):
    """Differentiable flash attention: pallas forward AND backward.

    Backward recomputes the masked probabilities blockwise from the saved
    (o, lse) residuals — two pallas kernels (dk/dv over key blocks, dq over
    query blocks); delta = rowsum(do*o) in XLA. With _USE_PALLAS_BWD=False
    an XLA einsum backward (materializing [T, T] transiently) is used
    instead:
        p  = exp(s - lse)
        dv = p^T do
        ds = p * (do v^T - rowsum(do * o))
        dq = ds k * scale ; dk = ds^T q * scale
    """

    @jax.custom_vjp
    def flash(q, k, v, mask):
        out, _ = _flash_forward(
            q, k, v, mask, causal=causal, scale=scale, block_q=block_q, block_k=block_k, use_mask=use_mask
        )
        return out

    def fwd(q, k, v, mask):
        out, lse = _flash_forward(
            q, k, v, mask, causal=causal, scale=scale, block_q=block_q, block_k=block_k, use_mask=use_mask
        )
        return out, (q, k, v, mask, out, lse)

    def bwd(res, g):
        q, k, v, mask, out, lse = res
        use_pallas_bwd = _PALLAS_BWD_MODE == "always" or (
            _PALLAS_BWD_MODE == "auto" and k.shape[2] > _PALLAS_BWD_KV_THRESHOLD
        )
        if use_pallas_bwd:
            dq, dk, dv = _flash_backward(
                q, k, v, mask, out, lse, g,
                causal=causal, scale=scale, block_q=block_q, block_k=block_k, use_mask=use_mask,
            )
            return dq, dk, dv, None
        q_len, k_len = q.shape[2], k.shape[2]
        # matmul operands stay bf16 (f32 accumulation via
        # preferred_element_type) — f32 operands run the MXU at 1/4 rate.
        # s is bit-identical to upcast-then-multiply (products of bf16
        # values, f32 accum — exactly what the pallas forward computed, so
        # exp(s - lse) yields exact probabilities); p/ds are rounded to bf16
        # for the gradient matmuls, the same operand precision flash-attn-2
        # uses. Softmax/exp and the ds elementwise algebra remain f32.
        bf = jnp.bfloat16
        qb, kb, vb, gb = (x.astype(bf) for x in (q, k, v, g))

        s = jnp.einsum("bhqd,bhkd->bhqk", qb, kb, preferred_element_type=jnp.float32) * scale
        if causal:
            offset = k_len - q_len
            qi = jnp.arange(q_len)[:, None]
            ki = jnp.arange(k_len)[None, :]
            s = jnp.where((ki <= qi + offset)[None, None], s, _NEG)
        if use_mask:
            keep = mask[:, None, None, :].astype(bool)
            s = jnp.where(keep, s, _NEG)
        p = jnp.exp(s - lse[..., None])  # exact probs; 0 for empty rows (lse=inf)
        pb = p.astype(bf)

        dv = jnp.einsum("bhqk,bhqd->bhkd", pb, gb, preferred_element_type=jnp.float32)
        dp = jnp.einsum("bhqd,bhkd->bhqk", gb, vb, preferred_element_type=jnp.float32)
        delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True)  # [b,h,q,1]
        ds = (p * (dp - delta)).astype(bf)
        dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kb, preferred_element_type=jnp.float32) * scale
        dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qb, preferred_element_type=jnp.float32) * scale
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None

    flash.defvjp(fwd, bwd)
    return flash


# ---------------------------------------------------------------------------
# Public dispatcher
# ---------------------------------------------------------------------------

# default flash block sizes; benchmarks (scripts/bench_sweep.py) may override
_DEFAULT_BLOCK_Q = 128
_DEFAULT_BLOCK_K = 128


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    key_padding_mask: Optional[jax.Array] = None,
    causal: bool = False,
    causal_offset=None,
    scale: Optional[float] = None,
    impl: str = "auto",
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jax.Array:
    """Attention with [B, H, T, D] layout.

    impl: "auto" (pallas flash on TPU, XLA elsewhere), "pallas", or "xla".
    A traced causal_offset (KV-cache decode) always routes to XLA.
    """
    head_dim = q.shape[-1]
    scale_f = float((head_dim ** -0.5) if scale is None else scale)
    block_q = _DEFAULT_BLOCK_Q if block_q is None else block_q
    block_k = _DEFAULT_BLOCK_K if block_k is None else block_k

    q_len, kv_len = q.shape[2], k.shape[2]
    # "auto" on TPU = the Pallas flash kernel. XLA's fused attention is ~25%
    # faster on a pure forward at VQA lengths, but under autodiff it saves
    # the [B, H, T, T] probabilities as residuals — at the canonical distill
    # step (student+teacher, 24 layers) that overflows HBM, while the flash
    # custom-VJP keeps only (o, lse). XLA remains the eval/KV-cache path.
    wants_pallas = impl == "pallas" or (impl == "auto" and (_on_tpu() or _INTERPRET))
    if wants_pallas and causal_offset is None:
        shapes_ok = head_dim % 128 == 0 or head_dim in (64, 96, 128, 256)
        shapes_ok = shapes_ok and q_len >= 8 and (not causal or kv_len == q_len)
        if shapes_ok:
            # the mask operand is always materialized (fixed custom_vjp arity)
            # but with use_mask=False the kernels never read it, so the
            # unmasked vision path skips the per-block key-padding loads
            use_mask = key_padding_mask is not None
            mask = (
                key_padding_mask.astype(jnp.int32)
                if use_mask
                else jnp.ones((q.shape[0], kv_len), jnp.int32)
            )
            bq = min(block_q, ((q_len + 127) // 128) * 128)
            flash = _make_flash(causal, scale_f, bq, block_k, use_mask)
            return flash(q, k, v, mask)
        if impl == "pallas":
            raise ValueError(f"unsupported shapes for pallas flash attention: {q.shape} {k.shape}")

    return xla_attention(
        q, k, v, key_padding_mask=key_padding_mask, causal=causal,
        causal_offset=causal_offset, scale=scale_f,
    )
