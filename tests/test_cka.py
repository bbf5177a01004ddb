"""CKA correctness: invariances and known identities."""

import numpy as np

from mafed_tpu.analysis.cka import cka_from_gram, feature_space_linear_cka, gram_linear, gram_rbf


def test_cka_self_similarity_is_one():
    x = np.random.default_rng(0).normal(size=(50, 16)).astype(np.float32)
    assert abs(feature_space_linear_cka(x, x) - 1.0) < 1e-5
    assert abs(cka_from_gram(gram_linear(x), gram_linear(x)) - 1.0) < 1e-5


def test_cka_invariant_to_orthogonal_transform_and_scale():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(60, 8)).astype(np.float32)
    q, _ = np.linalg.qr(rng.normal(size=(8, 8)))
    y = 3.0 * x @ q.astype(np.float32)
    assert abs(feature_space_linear_cka(x, y) - 1.0) < 1e-4


def test_gram_and_feature_space_agree():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(40, 6)).astype(np.float32)
    y = rng.normal(size=(40, 10)).astype(np.float32)
    a = feature_space_linear_cka(x, y)
    b = cka_from_gram(gram_linear(x), gram_linear(y))
    assert abs(a - b) < 1e-4


def test_independent_features_low_cka():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(200, 12)).astype(np.float32)
    y = rng.normal(size=(200, 12)).astype(np.float32)
    assert feature_space_linear_cka(x, y) < 0.2


def test_rbf_gram_properties():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(20, 5)).astype(np.float32)
    g = np.asarray(gram_rbf(x))
    assert np.allclose(np.diag(g), 1.0, atol=1e-5)
    assert np.allclose(g, g.T, atol=1e-6)


def test_debiased_cka_bounded():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(80, 6)).astype(np.float32)
    y = x + 0.1 * rng.normal(size=(80, 6)).astype(np.float32)
    v = feature_space_linear_cka(x, y, debiased=True)
    assert 0.5 < v <= 1.0 + 1e-6
