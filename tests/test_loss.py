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


def test_label_tail_loss_identical():
    """forward(label_tail=A) must equal the full-text loss whenever all
    supervised labels fit in the last A-1 positions (models/vl_pythia.py)."""
    import jax

    from tests.helpers import tiny_model_cfg
    from mafed_tpu.models import vl_pythia

    cfg = tiny_model_cfg()
    params = vl_pythia.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    b, t = 3, 16
    input_ids = rng.integers(1, cfg.vocab_size - 1, size=(b, t)).astype(np.int32)
    attention_mask = np.ones((b, t), np.int32)
    attention_mask[:, :4] = 0
    labels = input_ids.copy()
    for i, n_ans in enumerate([2, 5, 1]):
        labels[i, : t - n_ans] = -100
    pixels = rng.integers(0, 256, size=(b, cfg.vision.img_size, cfg.vision.img_size, 3)).astype(np.uint8)

    from mafed_tpu.data.images import prep_pixels

    px = prep_pixels({"pixels": pixels}, cfg.vision, jnp.float32)

    def loss(tail):
        return float(
            vl_pythia.forward(
                params, cfg, input_ids, px, attention_mask, labels,
                dtype=jnp.float32, attn_impl="xla", loss_only=True, label_tail=tail,
            ).loss
        )

    full = loss(None)
    assert abs(loss(8) - full) < 1e-6   # 8 >= max answer (5) + 1
    assert abs(loss(6) - full) < 1e-6   # exactly max answer + 1


def test_collate_label_tail_guard():
    from mafed_tpu.data.collate import collate_train

    items = [
        {
            "input_ids": np.arange(1, 11, dtype=np.int32),
            "labels": np.asarray([-100] * 8 + [5, 6], np.int32),
            "pixels": np.zeros((4, 4, 3), np.uint8),
        }
    ]
    out = collate_train(items, text_len=16, label_tail=8)  # fits
    assert out["labels"].shape == (1, 16)
    import pytest

    long_items = [
        {
            "input_ids": np.arange(1, 11, dtype=np.int32),
            "labels": np.arange(1, 11, dtype=np.int32),  # 10 supervised
            "pixels": np.zeros((4, 4, 3), np.uint8),
        }
    ]
    with pytest.raises(ValueError):
        collate_train(long_items, text_len=16, label_tail=8)
