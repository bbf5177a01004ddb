"""Fused distillation step behavior: pulling the student toward the teacher."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mafed_tpu.core.config import TrainConfig
from mafed_tpu.models import vl_pythia
from mafed_tpu.optim.optimizer import build_optimizer
from mafed_tpu.optim.sched import linear_warmup_schedule
from mafed_tpu.training.step import make_distill_step
from mafed_tpu.training.train_state import TrainState, split_params
from tests.helpers import tiny_model_cfg
from __graft_entry__ import _example_batch


@pytest.mark.slow
def test_distill_only_loss_decreases():
    model_cfg = tiny_model_cfg()
    train_cfg = TrainConfig(
        batch_size=4,
        learning_rate=5e-3,
        optim="adamw",
        replay_coeff=0.0,  # pure distillation
        distillation_coeff=1.0,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="discounted",
        distillation_layer_discount=0.5,
        grad_norm=-1,
    )
    params_s = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0))
    params_t = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(7))
    # teacher shares the (frozen) vision tower with the student
    params_t["vision"] = params_s["vision"]

    trainable, frozen = split_params(params_s)
    teacher_trainable, _ = split_params(params_t)
    tx = build_optimizer(train_cfg, trainable, linear_warmup_schedule(5e-3, 1, 10000))
    state = TrainState(jnp.zeros((), jnp.int32), trainable, frozen, tx.init(trainable))

    batch = {k: jnp.asarray(v) for k, v in _example_batch(model_cfg, 4, 16).items()}
    num_layers = model_cfg.num_hidden_layers - 1
    lang_coeffs = jnp.full((num_layers,), 0.5, jnp.float32)

    step = make_distill_step(model_cfg, train_cfg, tx, attn_impl="xla", donate=False)
    losses = []
    for _ in range(12):
        state, m = step(state, teacher_trainable, batch, lang_coeffs)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, f"distill loss did not decrease: {losses}"


def test_distill_loss_zero_when_student_equals_teacher():
    model_cfg = tiny_model_cfg()
    train_cfg = TrainConfig(
        batch_size=2, replay_coeff=0.0, distillation_coeff=1.0,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="equal",
        learning_rate=0.0, optim="adamw", grad_norm=-1,
    )
    params = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0))
    trainable, frozen = split_params(params)
    tx = build_optimizer(train_cfg, trainable, linear_warmup_schedule(0.0, 1, 10))
    state = TrainState(jnp.zeros((), jnp.int32), trainable, frozen, tx.init(trainable))
    batch = {k: jnp.asarray(v) for k, v in _example_batch(model_cfg, 2, 12).items()}
    lang_coeffs = jnp.full((model_cfg.num_hidden_layers - 1,), 0.5, jnp.float32)
    step = make_distill_step(model_cfg, train_cfg, tx, attn_impl="xla", donate=False)
    _, m = step(state, trainable, batch, lang_coeffs)  # teacher == student
    assert abs(float(m["loss"])) < 1e-5
