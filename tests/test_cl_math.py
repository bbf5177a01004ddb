"""Unit tests for CL-method math (SURVEY.md §4): EWC on a toy quadratic,
gamma-discount layer coefficients, memory-sampling determinism, distillation
losses and modality masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mafed_tpu.training.step import (
    _masked_token_loss,
    distillation_layers,
    ewc_penalty,
    layer_coefficients,
    modality_masks,
)


def test_ewc_penalty_toy_quadratic():
    # penalty = 0.5 * lambda * sum(F * (p - p*)^2)   (ewc.py:105-127)
    fisher = {"w": jnp.asarray([1.0, 2.0])}
    old = {"w": jnp.asarray([0.0, 0.0])}
    params = {"w": jnp.asarray([1.0, 1.0])}
    pen = float(ewc_penalty(params, (fisher, old), reg_lambda=10.0))
    assert abs(pen - 0.5 * 10.0 * (1.0 * 1 + 2.0 * 1)) < 1e-6


def test_ewc_penalty_gradient_pulls_toward_old():
    fisher = {"w": jnp.asarray([2.0])}
    old = {"w": jnp.asarray([3.0])}

    def f(p):
        return ewc_penalty(p, (fisher, old), reg_lambda=1.0)

    g = jax.grad(f)({"w": jnp.asarray([5.0])})
    # d/dp 0.5*F*(p-o)^2 = F*(p-o) = 2*(5-3) = 4
    assert abs(float(g["w"][0]) - 4.0) < 1e-6


def test_layer_coefficients_discounted_normalized():
    # gamma^distance over distances [L..1], normalized (dl_weights.py:49-60)
    coeffs = layer_coefficients("discounted", gamma=0.5, num_layers=3)
    raw = np.array([0.5 ** 3, 0.5 ** 2, 0.5 ** 1])
    np.testing.assert_allclose(coeffs, raw / raw.sum(), rtol=1e-6)
    assert abs(coeffs.sum() - 1.0) < 1e-6
    # nearest-to-output layer gets the LARGEST weight
    assert coeffs[-1] == coeffs.max()


def test_layer_coefficients_equal():
    coeffs = layer_coefficients("equal", gamma=0.9, num_layers=4)
    np.testing.assert_allclose(coeffs, [0.25] * 4)


def test_distillation_layers_rules():
    # valid explicit layer forces single (dl_weights.py:41-42)
    assert distillation_layers("discounted", 23, 5) == [5]
    assert distillation_layers("discounted", 23, None) == list(range(23))
    assert distillation_layers("equal", 23, None) == list(range(23))
    assert distillation_layers("cumulative", 23, 7) == list(range(7))
    with pytest.raises(ValueError):
        distillation_layers("single", 23, None)
    # out-of-range layer falls back to all layers
    assert distillation_layers("discounted", 23, 30) == list(range(23))


def test_memory_sampling_determinism():
    # reference: np.random.default_rng(seed).choice(...) (replay.py:38-41)
    a = np.random.default_rng(42).choice(np.arange(100), 10, replace=False)
    b = np.random.default_rng(42).choice(np.arange(100), 10, replace=False)
    np.testing.assert_array_equal(a, b)
    assert len(set(a.tolist())) == 10


def test_modality_masks_layout():
    am = jnp.asarray([[0, 0, 1, 1]])  # left-padded text
    lang, image = modality_masks(am, num_vision_tokens=3)
    np.testing.assert_array_equal(np.asarray(lang), [[0, 0, 0, 0, 0, 1, 1]])
    np.testing.assert_array_equal(np.asarray(image), [[1, 1, 1, 0, 0, 0, 0]])


def test_masked_mse_token_loss():
    h = jnp.asarray([[[1.0, 1.0], [2.0, 2.0], [5.0, 5.0]]])  # [1, 3, 2]
    hp = jnp.zeros_like(h)
    mask = jnp.asarray([[1, 1, 0]])
    # per-token mse = mean over dim: [1, 4, 25]; masked mean = (1+4)/2
    out = float(_masked_token_loss(h, hp, mask, "mse"))
    assert abs(out - 2.5) < 1e-6


def test_masked_cosine_token_loss():
    h = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]]])
    hp = jnp.asarray([[[1.0, 0.0], [1.0, 0.0]]])
    mask = jnp.asarray([[1, 1]])
    # cos sims: 1 and 0 -> losses 0 and 1 -> mean 0.5
    out = float(_masked_token_loss(h, hp, mask, "cosine"))
    assert abs(out - 0.5) < 1e-5
