"""Optimizer chain: stateful schedule, param groups, weight-decay masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mafed_tpu.core.config import TrainConfig
from mafed_tpu.optim.optimizer import (
    ScheduleState,
    build_optimizer,
    param_group_masks,
    set_schedule,
    triangular_factor,
)


def test_triangular_factor():
    s = ScheduleState(jnp.asarray(0), jnp.asarray(10), jnp.asarray(110))
    assert float(triangular_factor(s)) == 0.0
    s = s._replace(count=jnp.asarray(5))
    assert abs(float(triangular_factor(s)) - 0.5) < 1e-6
    s = s._replace(count=jnp.asarray(10))
    assert abs(float(triangular_factor(s)) - 1.0) < 1e-6
    s = s._replace(count=jnp.asarray(60))
    assert abs(float(triangular_factor(s)) - 0.5) < 1e-6
    s = s._replace(count=jnp.asarray(200))
    assert float(triangular_factor(s)) == 0.0


def test_set_schedule_reaches_nested_state():
    cfg = TrainConfig(optim="adamw", weight_decay=0.01, learning_rate=1e-3, accumulate_grad_batches=2)
    params = {"decoder": {"w": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    tx = optax.MultiSteps(build_optimizer(cfg, params), every_k_schedule=2)
    state = tx.init(params)
    state = set_schedule(state, warmup_steps=7, total_steps=70)
    found = []

    def visit(node):
        if isinstance(node, ScheduleState):
            found.append((int(node.warmup_steps), int(node.total_steps)))
        elif isinstance(node, tuple):
            for v in node:
                visit(v)
        elif isinstance(node, dict):
            for v in node.values():
                visit(v)

    visit(state)
    assert (7, 70) in found


def test_one_jitted_step_across_different_schedules():
    """Same compiled update works for different task horizons."""
    cfg = TrainConfig(optim="adamw", weight_decay=0.0, learning_rate=1.0)
    params = {"w": jnp.ones((2,))}
    tx = build_optimizer(cfg, params)
    grads = {"w": jnp.ones((2,))}

    @jax.jit
    def apply(state, params):
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    # horizon A: warmup 2 -> at step 0 lr = 0
    state = set_schedule(tx.init(params), 2, 20)
    p1, state = apply(state, params)
    np.testing.assert_allclose(np.asarray(p1["w"]), 1.0)  # lr=0 at count 0
    # horizon B: warmup 1 -> at step 1 lr = full
    state_b = set_schedule(tx.init(params), 1, 10)
    _, state_b = apply(state_b, params)  # count 0 -> lr 0
    p2, _ = apply(state_b, params)  # count 1 -> decay phase, lr>0
    assert float(p2["w"][0]) < 1.0


def test_weight_decay_mask_excludes_norms_and_biases():
    params = {
        "decoder": {
            "layers": {
                "input_layernorm": {"weight": jnp.ones((4,)), "bias": jnp.zeros((4,))},
                "attention": {"dense": {"weight": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}},
            }
        }
    }
    top, decay = param_group_masks(params)
    assert decay["decoder"]["layers"]["attention"]["dense"]["weight"] is True
    assert decay["decoder"]["layers"]["attention"]["dense"]["bias"] is False
    assert decay["decoder"]["layers"]["input_layernorm"]["weight"] is False
    assert not any(jax.tree.leaves(top))  # no vqa_output params in VL-Pythia
