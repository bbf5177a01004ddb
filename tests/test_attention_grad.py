"""Custom-VJP flash attention gradients vs XLA autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mafed_tpu.kernels import attention as attn_mod
from mafed_tpu.kernels.attention import dot_product_attention, xla_attention


@pytest.fixture(autouse=True)
def interpret_mode():
    attn_mod._INTERPRET = True
    attn_mod._PALLAS_BWD_MODE = "always"  # exercise the pallas bwd kernels
    yield
    attn_mod._INTERPRET = False
    attn_mod._PALLAS_BWD_MODE = "auto"


@pytest.mark.parametrize("causal", [False, True])
def test_flash_grads_match_xla(causal):
    rng = np.random.default_rng(0)
    b, h, t, d = 2, 2, 32, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    mask = np.ones((b, t), np.int32)
    mask[0, :5] = 0
    mask_j = jnp.asarray(mask)
    g = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    # zero the cotangent on rows whose outputs are garbage (fully-masked)
    if causal:
        g = g * mask_j[:, None, :, None]

    def f_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, key_padding_mask=mask_j, causal=causal) * g)

    def f_flash(q, k, v):
        return jnp.sum(
            dot_product_attention(q, k, v, key_padding_mask=mask_j, causal=causal, impl="pallas") * g
        )

    ref_grads = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    got_grads = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    for got, ref, name in zip(got_grads, ref_grads, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=3e-4, rtol=1e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_flash_value_and_grad_finite_fully_masked_rows():
    """Fully-masked rows must produce zero outputs and zero (not NaN) grads."""
    rng = np.random.default_rng(1)
    b, h, t, d = 1, 1, 16, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k, v = q + 1.0, q - 1.0
    mask = np.ones((b, t), np.int32)
    mask[:, :16] = 0  # ALL keys masked

    def f(q):
        out = dot_product_attention(q, k, v, key_padding_mask=jnp.asarray(mask), impl="pallas")
        return jnp.sum(out), out

    (loss, out), grad = jax.value_and_grad(f, has_aux=True)(q)
    assert np.allclose(np.asarray(out), 0.0)
    assert np.isfinite(np.asarray(grad)).all()
    assert np.allclose(np.asarray(grad), 0.0)
