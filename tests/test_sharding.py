"""SPMD tests on the 8-virtual-device CPU mesh (SURVEY.md §4
"distributed-without-a-cluster"): pjit'd train step under dp x tp, metric
psum reduction, and the multichip dry run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mafed_tpu.core.mesh import batch_sharding, make_mesh, param_partition_spec, shard_params


def test_make_mesh_infers_data_axis(eight_devices):
    mesh = make_mesh((-1, 2), ("data", "model"))
    assert mesh.devices.shape == (4, 2)
    mesh1 = make_mesh((-1, 1), ("data", "model"))
    assert mesh1.devices.shape == (8, 1)


def test_param_partition_specs():
    w = np.zeros((8, 16))
    assert param_partition_spec(("decoder", "layers", "attention", "query_key_value", "weight"), w) == P(None, "model")
    assert param_partition_spec(("decoder", "layers", "attention", "dense", "weight"), w) == P("model", None)
    assert param_partition_spec(("decoder", "layers", "mlp", "dense_h_to_4h", "weight"), w) == P(None, "model")
    assert param_partition_spec(("decoder", "final_layer_norm", "weight"), np.zeros((8,))) == P()


def test_psum_metric_reduction(eight_devices):
    """Distributed metric all_reduce: the TPU-native replacement for the
    reference's NCCL all_reduce (eval_utils.py:135-138)."""
    mesh = make_mesh((8,), ("data",))

    @jax.jit
    def global_accuracy(correct, total):
        from jax.experimental.shard_map import shard_map

        def local(c, t):
            return (
                jax.lax.psum(jnp.sum(c), "data"),
                jax.lax.psum(jnp.sum(t), "data"),
            )

        c, t = shard_map(
            local, mesh=mesh,
            in_specs=(P("data"), P("data")),
            out_specs=(P(), P()),
        )(correct, total)
        return c / t

    correct = jax.device_put(np.arange(8, dtype=np.float32), NamedSharding(mesh, P("data")))
    total = jax.device_put(np.full((8,), 2.0, np.float32), NamedSharding(mesh, P("data")))
    acc = float(global_accuracy(correct, total))
    assert abs(acc - (np.arange(8).sum() / 16.0)) < 1e-6


@pytest.mark.slow
def test_dryrun_multichip_8(eight_devices):
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_with_preinitialized_small_backend():
    """Regression for the round-1 driver failure (MULTICHIP_r01 rc=1): the
    caller initializes a 1-device backend BEFORE calling dryrun_multichip(8).
    The dry run must detect the shortfall and re-exec in a scrubbed
    subprocess instead of raising."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; assert len(jax.devices()) == 1; "
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
        ],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip ok on 8 devices" in proc.stdout


@pytest.mark.slow
def test_sharded_train_step_matches_single_device(eight_devices):
    """DP-sharded step must produce the same loss as replicated execution."""
    from __graft_entry__ import _example_batch
    from mafed_tpu.core.config import ModelConfig, TrainConfig, VisionConfig
    from mafed_tpu.models import vl_pythia
    from mafed_tpu.optim.optimizer import build_optimizer
    from mafed_tpu.optim.sched import linear_warmup_schedule
    from mafed_tpu.training.step import make_train_step
    from mafed_tpu.training.train_state import TrainState, split_params

    model_cfg = ModelConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64,
        vision=VisionConfig(img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0),
    )
    train_cfg = TrainConfig(batch_size=8, accumulate_grad_batches=1, optim="adamw", weight_decay=0.01)
    params = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0))
    trainable, frozen = split_params(params)
    tx = build_optimizer(train_cfg, trainable, linear_warmup_schedule(1e-3, 2, 100))

    batch_np = _example_batch(model_cfg, batch=8, text_len=16)

    def run(mesh=None):
        t = jax.tree.map(lambda x: x, trainable)
        state = TrainState(jnp.zeros((), jnp.int32), t, frozen, tx.init(t))
        step = make_train_step(model_cfg, train_cfg, tx, attn_impl="xla", donate=False)
        if mesh is not None:
            sh = batch_sharding(mesh)
            batch = {k: jax.device_put(v, sh) for k, v in batch_np.items()}
        else:
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        _, m = step(state, batch)
        return float(m["loss"])

    loss_single = run()
    loss_dp = run(make_mesh((8, 1), ("data", "model")))
    assert abs(loss_single - loss_dp) < 1e-4


@pytest.mark.slow
def test_tp2_window_step_1b_proportions(eight_devices):
    """VERDICT r1 #10: exercise the (data=4, model=2) layout at 1B-like
    proportions — Pythia-1B ratios (8 heads, intermediate = 4x hidden,
    parallel residual) scaled down — through the fused MAFED window step,
    with QKV/MLP weights sharded over 'model' and the batch over 'data'."""
    from __graft_entry__ import _example_batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mafed_tpu.core.config import ModelConfig, TrainConfig, VisionConfig
    from mafed_tpu.core.mesh import shard_params
    from mafed_tpu.models import vl_pythia
    from mafed_tpu.optim.optimizer import build_optimizer
    from mafed_tpu.optim.sched import linear_warmup_schedule
    from mafed_tpu.training.step import make_mafed_window_step
    from mafed_tpu.training.train_state import TrainState, split_params
    import numpy as np

    # Pythia-1B proportions: heads=8, intermediate=4*hidden, layers shrunk
    model_cfg = ModelConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2, num_attention_heads=8,
        intermediate_size=256, rotary_pct=0.25,
        vision=VisionConfig(img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0),
    )
    train_cfg = TrainConfig(
        batch_size=4, accumulate_grad_batches=1, optim="adamw", weight_decay=0.01,
        replay_coeff=1.0, distillation_coeff=1.0,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="discounted",
    )
    mesh = make_mesh((4, 2), ("data", "model"))
    params = shard_params(vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0)), mesh)
    trainable, frozen = split_params(params)
    teacher = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    tx = build_optimizer(train_cfg, trainable, linear_warmup_schedule(1e-3, 2, 100))
    state = TrainState(jnp.zeros((), jnp.int32), trainable, frozen, tx.init(trainable))

    sh = batch_sharding(mesh)
    wsh = NamedSharding(mesh, P(None, "data"))
    batch = {k: jax.device_put(v, sh) for k, v in _example_batch(model_cfg, 4, 16).items()}
    ce_stack = {
        k: jax.device_put(
            np.stack([_example_batch(model_cfg, 4, 16, seed=s)[k] for s in range(3)]), wsh
        )
        for k in batch
    }
    lang_coeffs = jnp.full((model_cfg.num_hidden_layers - 1,), 0.5, jnp.float32)

    step = make_mafed_window_step(model_cfg, train_cfg, tx, n_ce=3, donate=False)
    _, m = step(state, teacher, ce_stack, batch, lang_coeffs)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_dp8_two_fit_steps_and_validate_match_single_device(eight_devices):
    """VERDICT r1 #3 done-criterion: 2 train steps + 1 generative validate
    under dp=8 must match the single-device numbers for the same global
    batch (SPMD DP is a pure layout change)."""
    from __graft_entry__ import _example_batch
    from mafed_tpu.core.config import ModelConfig, TrainConfig, VisionConfig
    from mafed_tpu.data.tokenizer import ByteTokenizer
    from mafed_tpu.evaluation.decode import make_greedy_decoder
    from mafed_tpu.evaluation.validate import validate_vqa
    from mafed_tpu.models import vl_pythia
    from mafed_tpu.optim.optimizer import build_optimizer
    from mafed_tpu.optim.sched import linear_warmup_schedule
    from mafed_tpu.training.step import make_train_step
    from mafed_tpu.training.train_state import TrainState, merge_params, split_params

    model_cfg = ModelConfig(
        vocab_size=300, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64,
        vision=VisionConfig(img_size=28, patch_size=14, embed_dim=32, depth=1, num_heads=2, mlp_ratio=2.0),
    )
    train_cfg = TrainConfig(batch_size=8, accumulate_grad_batches=1, optim="adamw",
                            weight_decay=0.01, learning_rate=1e-3)
    params = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0))
    trainable, frozen = split_params(params)
    tx = build_optimizer(train_cfg, trainable, linear_warmup_schedule(1e-3, 2, 100))

    batches = [_example_batch(model_cfg, batch=8, text_len=16, seed=s) for s in (0, 1)]
    tok = ByteTokenizer()
    decoder = make_greedy_decoder(model_cfg, eos_token_id=tok.eos_token_id, attn_impl="xla")
    val_batch = _example_batch(model_cfg, batch=8, text_len=16, seed=3)
    val_batch["qids"] = [f"q{i}" for i in range(8)]
    val_batch["answers"] = [["yes"] * 10 for _ in range(8)]

    def run(mesh=None):
        t = jax.tree.map(lambda x: x, trainable)
        state = TrainState(jnp.zeros((), jnp.int32), t, frozen, tx.init(t))
        step = make_train_step(model_cfg, train_cfg, tx, attn_impl="xla", donate=False)
        sh = batch_sharding(mesh) if mesh is not None else None
        losses = []
        for b in batches:
            db = {k: jax.device_put(v, sh) if sh is not None else jnp.asarray(v) for k, v in b.items()}
            state, m = step(state, db)
            losses.append(float(m["loss"]))
        log, _ = validate_vqa(
            merge_params(state.trainable, state.frozen), decoder, [val_batch], tok,
            batch_size=8, sharding=sh,
        )
        return losses, log["valid/acc"], log["valid/n_ex"]

    losses_1, acc_1, n_1 = run()
    losses_8, acc_8, n_8 = run(make_mesh((8, 1), ("data", "model")))
    assert n_1 == n_8 == 8
    assert all(abs(a - b) < 1e-4 for a, b in zip(losses_1, losses_8)), (losses_1, losses_8)
    assert abs(acc_1 - acc_8) < 1e-9


def test_multiprocess_eval_sharding_never_none(monkeypatch):
    """Under multi-process, per-process decode must ALWAYS get a process-local
    (sharding, param_sharding) pair: a None pair would dispatch decode on
    globally-sharded params — a collective over UNEQUAL per-host val batch
    counts (deadlock). The single-local-device / indivisible-batch fallback is
    a SingleDeviceSharding, not None."""
    from helpers import tiny_model_cfg

    from mafed_tpu.core.config import TrainConfig
    from mafed_tpu.data.tokenizer import ByteTokenizer
    from mafed_tpu.trainer.runner import TaskRunner

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    # indivisible val batch (8 local CPU devices, batch 3) -> fallback branch
    cfg = TrainConfig(batch_size=4, val_batch_size=3)
    runner = TaskRunner(tiny_model_cfg(), cfg, ByteTokenizer(), mesh=None)
    assert isinstance(runner.eval_sharding, jax.sharding.SingleDeviceSharding)
    assert isinstance(runner.eval_param_sharding, jax.sharding.SingleDeviceSharding)
    # divisible batch -> all local devices via a process-local mesh
    cfg8 = TrainConfig(batch_size=4, val_batch_size=8)
    runner8 = TaskRunner(tiny_model_cfg(), cfg8, ByteTokenizer(), mesh=None)
    assert isinstance(runner8.eval_sharding, NamedSharding)
    assert runner8.eval_param_sharding is not None
