"""Attention for TPU: Pallas flash-attention kernel + XLA reference path.

Replaces the reference's external flash-attn-2 CUDA dependency
(reference README.md:16; enabled at mafed/model/vl_pythia.py:392-397) with an
in-repo Pallas kernel. One kernel serves both uses:

  * GPT-NeoX decoder: causal over [256 vision prefix + text], with a
    key-padding mask for left-padded text (mafed/model/vl_pythia.py:281-292).
  * EVA-02 ViT encoder: non-causal, no mask.

Layout convention: q, k, v are [batch, heads, seq, head_dim].

The kernel is a standard blockwise online-softmax flash attention: the grid
iterates (batch*heads, q_blocks), each program streams k/v blocks through
VMEM with running max/sum rescaling, so HBM traffic is O(T) per row instead
of materializing the [T, T] score matrix. Causal q-blocks skip fully-masked
k-blocks. The backward pass is left to XLA autodiff through the reference
path by default (training uses `impl="xla"` under jit unless the Pallas
custom-VJP path is selected).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_INTERPRET = False  # flipped by tests on CPU


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# XLA reference implementation (also the autodiff path)
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
    neg = jnp.finfo(jnp.float32).min
    if causal:
        # offset aligns the causal diagonal: query row i sits at absolute
        # position offset+i in the key sequence. Defaults to q-as-suffix-of-k;
        # KV-cache prefill passes the (traced) cache length instead.
        offset = (k_len - q_len) if causal_offset is None else causal_offset
        qi = jnp.arange(q_len)[:, None]
        ki = jnp.arange(k_len)[None, :]
        scores = jnp.where((ki <= qi + offset)[None, None], scores, neg)
    if key_padding_mask is not None:
        keep = key_padding_mask[:, None, None, :].astype(bool)
        scores = jnp.where(keep, scores, neg)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------

def _flash_kernel(
    mask_ref,  # [1, k_len] int32 key-padding (scalar-prefetch-ish input) or None sentinel
    q_ref,     # [1, block_q, head_dim]
    k_ref,     # [1, k_len, head_dim]
    v_ref,     # [1, k_len, head_dim]
    o_ref,     # [1, block_q, head_dim]
    *,
    causal: bool,
    scale: float,
    block_k: int,
    q_offset_blocks: int,
    kv_len: int,
    use_mask: bool,
):
    from jax.experimental import pallas as pl

    block_q = q_ref.shape[1]
    head_dim = q_ref.shape[2]
    qi = pl.program_id(1)

    q = q_ref[0].astype(jnp.float32) * scale  # [block_q, head_dim]

    num_k_blocks = pl.cdiv(kv_len, block_k)
    # causal: query rows in this block span [q_start, q_start + block_q)
    q_start = (qi + q_offset_blocks) * block_q if causal else 0

    def body(ki_idx, carry):
        acc, m_prev, l_prev = carry
        k_start = ki_idx * block_k
        k_blk = k_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # [bq, bk]

        neg = jnp.finfo(jnp.float32).min
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            s = jnp.where(cols <= rows, s, neg)
        if use_mask:
            keep = mask_ref[0, pl.ds(k_start, block_k)] > 0
            s = jnp.where(keep[None, :], s, neg)

        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, head_dim), jnp.float32)
    m0 = jnp.full((block_q,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)

    if causal:
        # skip k-blocks strictly above the diagonal for this q block
        last_block = jax.lax.div(q_start + block_q - 1, block_k) + 1
        upper = jnp.minimum(last_block, num_k_blocks)
    else:
        upper = num_k_blocks
    acc, m_fin, l_fin = jax.lax.fori_loop(0, upper, body, (acc0, m0, l0))
    l_safe = jnp.where(l_fin == 0.0, 1.0, l_fin)
    o_ref[0] = (acc / l_safe[:, None]).astype(o_ref.dtype)


def _pallas_flash(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    key_padding_mask: Optional[jax.Array],
    causal: bool,
    scale: float,
    block_q: int = 128,
    block_k: int = 128,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, heads, q_len, head_dim = q.shape
    kv_len = k.shape[2]

    # pad sequence dims to block multiples
    q_pad = (-q_len) % block_q
    k_pad = (-kv_len) % block_k
    use_mask = key_padding_mask is not None or k_pad > 0
    if key_padding_mask is None:
        mask = jnp.ones((batch, kv_len), jnp.int32)
    else:
        mask = key_padding_mask.astype(jnp.int32)
    if k_pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, k_pad)))
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, q_pad), (0, 0)))

    padded_q_len = q_len + q_pad
    padded_k_len = kv_len + k_pad
    bh = batch * heads
    qm = q.reshape(bh, padded_q_len, head_dim)
    km = k.reshape(bh, padded_k_len, head_dim)
    vm = v.reshape(bh, padded_k_len, head_dim)
    maskm = jnp.repeat(mask, heads, axis=0)  # [bh, padded_k_len]

    # causal diagonal offset when q is the suffix of the kv sequence
    q_offset = kv_len - q_len if causal else 0
    if causal and q_offset % block_q != 0:
        # uncommon path (cache decode uses q_len==1 handled by XLA); just
        # fall back to full causal from absolute positions via offset blocks=0
        # and rely on padding — handled by caller choosing XLA instead.
        raise ValueError("pallas path requires q_offset to be a multiple of block_q")

    grid = (bh, padded_q_len // block_q)

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        scale=scale,
        block_k=block_k,
        q_offset_blocks=q_offset // block_q,
        kv_len=padded_k_len,
        use_mask=use_mask,
    )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, padded_k_len), lambda b, i: (b, 0)),
            pl.BlockSpec((1, block_q, head_dim), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, padded_k_len, head_dim), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, padded_k_len, head_dim), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, head_dim), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, padded_q_len, head_dim), q.dtype),
        interpret=_INTERPRET,
    )(maskm, qm, km, vm)

    out = out.reshape(batch, heads, padded_q_len, head_dim)
    if q_pad:
        out = out[:, :, :q_len]
    return out


# ---------------------------------------------------------------------------
# Public dispatcher
# ---------------------------------------------------------------------------

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
) -> jax.Array:
    """Attention with [B, H, T, D] layout.

    impl: "auto" (pallas on TPU for inference-friendly shapes, else XLA),
    "pallas", or "xla". A traced causal_offset (KV-cache prefill/decode)
    always routes to XLA.
    """
    head_dim = q.shape[-1]
    scale = (head_dim ** -0.5) if scale is None else scale

    if impl == "xla" or causal_offset is not None:
        return xla_attention(
            q, k, v, key_padding_mask=key_padding_mask, causal=causal,
            causal_offset=causal_offset, scale=scale,
        )

    wants_pallas = impl == "pallas" or (impl == "auto" and (_on_tpu() or _INTERPRET))
    if wants_pallas:
        q_len, kv_len = q.shape[2], k.shape[2]
        ok = q.shape[-1] % 128 == 0 or q.shape[-1] in (64, 96)
        ok = ok and q_len >= 8 and (not causal or kv_len == q_len)
        if ok:
            try:
                return _pallas_flash(q, k, v, key_padding_mask=key_padding_mask, causal=causal, scale=scale)
            except Exception:
                if impl == "pallas":
                    raise
    return xla_attention(q, k, v, key_padding_mask=key_padding_mask, causal=causal, scale=scale)
