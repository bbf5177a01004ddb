"""Flash-attention kernel correctness vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mafed_tpu.kernels import attention as attn_mod
from mafed_tpu.kernels.attention import dot_product_attention, xla_attention


@pytest.fixture(autouse=True)
def interpret_mode():
    """Run pallas kernels in interpreter mode on CPU."""
    attn_mod._INTERPRET = True
    yield
    attn_mod._INTERPRET = False


def rand_qkv(b=2, h=4, tq=64, tk=64, d=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, tq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, tk, d)).astype(np.float32))
    return q, k, v


def test_noncausal_matches_xla():
    q, k, v = rand_qkv()
    ref = xla_attention(q, k, v)
    got = dot_product_attention(q, k, v, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_causal_matches_xla():
    q, k, v = rand_qkv(tq=128, tk=128)
    ref = xla_attention(q, k, v, causal=True)
    got = dot_product_attention(q, k, v, causal=True, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_key_padding_mask():
    q, k, v = rand_qkv(tq=32, tk=32)
    mask = np.ones((2, 32), np.int32)
    mask[0, :7] = 0
    mask[1, :3] = 0
    mask_j = jnp.asarray(mask)
    ref = np.asarray(xla_attention(q, k, v, key_padding_mask=mask_j, causal=True))
    got = np.asarray(dot_product_attention(q, k, v, key_padding_mask=mask_j, causal=True, impl="pallas"))
    # rows whose keys are fully masked (left-padded positions) are garbage in
    # both implementations and never consumed — compare valid rows only
    valid_rows = mask.astype(bool)  # row i valid iff key i valid (causal+left-pad)
    for b in range(2):
        np.testing.assert_allclose(
            got[b][:, valid_rows[b]], ref[b][:, valid_rows[b]], atol=2e-5, rtol=1e-4
        )


def test_unaligned_lengths_padded():
    # 316 = 256 vision + 60 text: the canonical training length
    q, k, v = rand_qkv(tq=316, tk=316, seed=3)
    mask = np.ones((2, 316), np.int32)
    mask[:, 256:270] = 0
    mask_j = jnp.asarray(mask)
    ref = xla_attention(q, k, v, key_padding_mask=mask_j, causal=True)
    got = dot_product_attention(q, k, v, key_padding_mask=mask_j, causal=True, impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_causal_offset_decode():
    # single-query decode against a longer key buffer (XLA path)
    q, k, v = rand_qkv(tq=1, tk=16)
    mask = np.ones((2, 16), np.int32)
    mask[:, 10:] = 0  # only 10 cache slots valid
    out = dot_product_attention(
        q, k, v, key_padding_mask=jnp.asarray(mask), causal=True,
        causal_offset=jnp.asarray(9), impl="auto",
    )
    # equivalent to full attention over the 10 valid keys
    ref = xla_attention(q, k[:, :, :10], v[:, :, :10])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_grad_flows_through_xla_path():
    q, k, v = rand_qkv(tq=8, tk=8, d=16)

    def f(q):
        return jnp.sum(dot_product_attention(q, k, v, causal=True, impl="xla"))

    g = jax.grad(f)(q)
    assert np.isfinite(np.asarray(g)).all()
