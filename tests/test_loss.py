"""Length-normalized CE loss parity vs a torch re-derivation of the
reference's average_task_loss/compute_loss (vl_pythia.py:44-96)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mafed_tpu.models.vl_pythia import average_task_loss, compute_loss, masked_mean

torch = pytest.importorskip("torch")


def torch_reference_loss(labels, logits):
    """Literal re-derivation of the reference loss for testing."""
    labels = torch.tensor(labels)
    logits = torch.tensor(logits)
    logits = logits[:, -labels.size(1):, :]
    shift_logits = logits[..., :-1, :].contiguous()
    shift_labels = labels[..., 1:].contiguous()
    bsz, seq_len = shift_labels.size()
    loss_fct = torch.nn.CrossEntropyLoss(reduction="none")
    labels_mask = shift_labels != -100
    loss = loss_fct(
        shift_logits.reshape(-1, logits.size(-1)), shift_labels.reshape(-1)
    ).view(bsz, seq_len)
    replaced = loss.masked_fill(~labels_mask, 0.0)
    value_sum = replaced.sum(dim=-1)
    value_count = labels_mask.sum(dim=-1)
    per_sample = value_sum / value_count.float().clamp(min=1e-13)
    return per_sample.mean().item()


def test_compute_loss_matches_reference():
    rng = np.random.default_rng(0)
    b, t_label, t_full, v = 4, 12, 20, 33
    logits = rng.normal(size=(b, t_full, v)).astype(np.float32)
    labels = rng.integers(0, v, size=(b, t_label)).astype(np.int64)
    # question prefix masked with -100, variable lengths
    for i, n in enumerate([3, 5, 0, 11]):
        labels[i, :n] = -100

    ref = torch_reference_loss(labels, logits)
    got = float(compute_loss(jnp.asarray(labels), jnp.asarray(logits)))
    assert abs(got - ref) < 1e-5


def test_all_masked_sample_contributes_zero():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 6, 10)).astype(np.float32)
    labels = rng.integers(0, 10, size=(2, 6)).astype(np.int64)
    labels[1, :] = -100  # fully masked sample
    ref = torch_reference_loss(labels, logits)
    got = float(compute_loss(jnp.asarray(labels), jnp.asarray(logits)))
    assert abs(got - ref) < 1e-4


def test_masked_mean():
    v = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    m = jnp.asarray([[True, True, False], [False, False, True]])
    out = np.asarray(masked_mean(v, m, axis=-1))
    np.testing.assert_allclose(out, [1.5, 6.0])
