"""Centered Kernel Alignment (CKA) representation-similarity metrics.

Same capability as the reference's vendored google-research CKA
(mafed/analysis/cka.py:10-195): linear/RBF gram matrices, biased and
debiased HSIC estimators, and the memory-efficient feature-space linear
form. Implemented here as batched jnp ops so per-layer similarity across a
whole checkpoint sweep runs device-side in one jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gram_linear(x):
    """Gram matrix for a linear kernel. x: [n, features]."""
    x = jnp.asarray(x)
    return x @ x.T


def gram_rbf(x, threshold: float = 1.0):
    """RBF-kernel gram with bandwidth = threshold * median distance."""
    x = jnp.asarray(x)
    dot = x @ x.T
    sq_norms = jnp.diag(dot)
    sq_dist = sq_norms[:, None] + sq_norms[None, :] - 2 * dot
    sq_median = jnp.median(sq_dist)
    return jnp.exp(-sq_dist / (2 * threshold ** 2 * sq_median + 1e-12))


def center_gram(gram, unbiased: bool = False):
    """Center a symmetric gram matrix (optionally the unbiased estimator)."""
    gram = jnp.asarray(gram, jnp.float64) if gram.dtype == np.float64 else jnp.asarray(gram)
    n = gram.shape[0]
    if unbiased:
        gram = gram - jnp.diag(jnp.diag(gram))
        means = jnp.sum(gram, axis=0) / (n - 2)
        means = means - jnp.sum(means) / (2 * (n - 1))
        gram = gram - means[:, None] - means[None, :]
        gram = gram - jnp.diag(jnp.diag(gram))
        return gram
    means = jnp.mean(gram, axis=0)
    means = means - jnp.mean(means) / 2
    return gram - means[:, None] - means[None, :]


def cka_from_gram(gram_x, gram_y, debiased: bool = False) -> float:
    """CKA between two gram matrices."""
    gx = center_gram(gram_x, unbiased=debiased)
    gy = center_gram(gram_y, unbiased=debiased)
    hsic = jnp.sum(gx * gy)
    norm_x = jnp.sqrt(jnp.sum(gx * gx))
    norm_y = jnp.sqrt(jnp.sum(gy * gy))
    return float(hsic / (norm_x * norm_y + 1e-12))


def feature_space_linear_cka(x, y, debiased: bool = False) -> float:
    """Linear CKA computed in feature space — O(n d^2) instead of O(n^2 d)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    x = x - jnp.mean(x, axis=0, keepdims=True)
    y = y - jnp.mean(y, axis=0, keepdims=True)

    dot_similarity = jnp.linalg.norm(x.T @ y) ** 2
    norm_x = jnp.linalg.norm(x.T @ x)
    norm_y = jnp.linalg.norm(y.T @ y)

    if debiased:
        n = x.shape[0]
        sum_sq_x = jnp.sum(jnp.square(x), axis=1)
        sum_sq_y = jnp.sum(jnp.square(y), axis=1)
        sq_x = jnp.square(jnp.linalg.norm(x, axis=1))
        sq_y = jnp.square(jnp.linalg.norm(y, axis=1))
        dot_similarity = _debias_dot(dot_similarity, sq_x, sq_y, n)
        norm_x = jnp.sqrt(jnp.maximum(_debias_dot(norm_x ** 2, sq_x, sq_x, n), 0.0))
        norm_y = jnp.sqrt(jnp.maximum(_debias_dot(norm_y ** 2, sq_y, sq_y, n), 0.0))

    return float(dot_similarity / (norm_x * norm_y + 1e-12))


def _debias_dot(xty_sq, sq_row_x, sq_row_y, n):
    """Song et al. unbiased HSIC correction in feature space."""
    sum_x = jnp.sum(sq_row_x)
    sum_y = jnp.sum(sq_row_y)
    return (
        xty_sq
        - n / (n - 2) * jnp.sum(sq_row_x * sq_row_y)
        + sum_x * sum_y / ((n - 1) * (n - 2))
    )
