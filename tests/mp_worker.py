"""Worker entry for the REAL multi-process test (test_multiprocess.py).

Runs the full ContinualLearningTrainer (fused MAFED windows, sharded
loaders, resume bundles, generative validation with cross-process metric
reduction) under `jax.distributed` with N processes x 2 virtual CPU devices
each. With nproc=1 it is the single-process comparator on the same 4-device
topology.

argv: <process_id> <num_processes> <coordinator_port> <data_root> <out_tag> [mode]
mode: "none" (default) | "preempt:N" (raise cooperative preemption after N
applied updates; exits 0 after the collective bundle save) | "resume"
(restart with resume_from_checkpoint against the same output_dir)
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, root, out_tag = sys.argv[3], sys.argv[4], sys.argv[5]
    mode = sys.argv[6] if len(sys.argv) > 6 else "none"

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        n_local = 2 if nproc > 1 else 4
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local}"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")
    # share the test suite's persistent compile cache (tiny programs recompile
    # identically across workers)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
        )
        assert jax.process_count() == nproc
        assert jax.device_count() == 2 * nproc

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers import synthetic_config, tiny_model_cfg

    from mafed_tpu.core.dist import is_main_process, process_reduce_sum
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    if mode == "tpstep":
        _tp_step_probe(root, out_tag, pid, nproc)
        print(f"worker {pid}/{nproc} tpstep ok", flush=True)
        return
    if mode == "pretrain":
        _pretrain_probe(root, out_tag, pid, nproc)
        print(f"worker {pid}/{nproc} pretrain ok", flush=True)
        return

    # the host-scalar reduction used by validate_vqa (reference NCCL
    # all_reduce, eval_utils.py:135-138) — checked directly with known values
    red = process_reduce_sum(float(pid) + 1.0, 10.0)
    expected = (sum(range(1, nproc + 1)) * 1.0, 10.0 * nproc)

    cfg = synthetic_config(root)
    cfg.output_dir = os.path.join(root, out_tag)
    # fused MAFED windows: global batch 8 (4 per process at nproc=2), accum 2
    cfg.batch_size = 8
    cfg.val_batch_size = 4
    cfg.accumulate_grad_batches = 2
    cfg.replay_interval = 2
    cfg.cl_method = "featdistill"
    cfg.cl_memory = 8
    cfg.replay_coeff = 1.0
    cfg.distillation_coeff = 1.0
    cfg.distillation_modality_weighing_strategy = "balanced"
    cfg.distillation_layer_weighing_strategy = "discounted"
    cfg.epochs = [2, 2]
    cfg.mesh_shape = [-1, 1]
    cfg.fused_window = True
    cfg.resume_bundle_every = 1
    # teacher-state cache ON: executes the multi-process priming path for
    # real (params localized per-process before non-collective dispatch,
    # coordinated staleness stamping, t_hs flowing through the per-process
    # window shards) — pure work-removal, so equality with the
    # single-process run still holds
    cfg.teacher_state_cache = True

    if mode == "resume":
        cfg.resume_from_checkpoint = os.path.join(cfg.output_dir, "resume")

    trainer = ContinualLearningTrainer(cfg, model_cfg=tiny_model_cfg(), synthetic_images=True)
    assert trainer.is_main == (pid == 0)
    assert (trainer.metrics is None) == (pid != 0)

    if mode.startswith("preempt:"):
        # deterministic stand-in for SIGTERM landing on every host: all
        # processes flip after the same applied update, save the resume
        # bundle COLLECTIVELY (orbax shard writes from each process), raise
        from mafed_tpu.core import preempt

        preempt.request_preemption_after(int(mode.split(":", 1)[1]))
        try:
            trainer.main()
        except preempt.Preempted:
            with open(os.path.join(root, f"worker_{out_tag}_{pid}.json"), "w") as f:
                json.dump({"pid": pid, "preempted": True}, f)
            print(f"worker {pid}/{nproc} preempted ok", flush=True)
            return
        raise AssertionError("preemption did not fire")

    result = trainer.main()
    # set during setup_task_optimizer: fused windows must stay ON under
    # multi-process (the single-controller restriction is lifted)
    assert trainer.runner.window == 2, f"fused windows off: window={trainer.runner.window}"

    with open(os.path.join(root, f"worker_{out_tag}_{pid}.json"), "w") as f:
        json.dump(
            {
                "pid": pid,
                "reduce": list(red),
                "reduce_expected": list(expected),
                "accuracy_matrix": result["accuracy_matrix"],
                "average_accuracy": result["average_accuracy"],
                "bwt": result["bwt"],
                "is_main": trainer.is_main,
                "window": trainer.runner.window,
            },
            f,
        )
    print(f"worker {pid}/{nproc} ok", flush=True)


def _pretrain_probe(root: str, out_tag: str, pid: int, nproc: int) -> None:
    """SPMD captioning pretrain on a (virtual) pod: per-host sharded
    loaders, dp4 mesh spanning the processes, collective orbax checkpoint
    saves, rank-0 metrics/safetensors. Loss curve and checkpoint-final must
    match the single-process run of the same 4-device mesh program."""
    from helpers import tiny_model_cfg

    from mafed_tpu.core.mesh import make_mesh
    from mafed_tpu.data.tokenizer import ByteTokenizer
    from mafed_tpu.pretrain.dataset import CaptionRecord, PretrainDataset
    from mafed_tpu.pretrain.trainer import PretrainConfig, PretrainTrainer

    mc = tiny_model_cfg()
    tok = ByteTokenizer(model_max_length=32)

    def ds(n, prefix):
        recs = [
            CaptionRecord(image=f"{prefix}{i}", caption=f"a photo of thing {i}", source="coco")
            for i in range(n)
        ]
        return PretrainDataset(tok, mc.vision, records=recs, model_max_length=32, synthetic_images=True)

    args = PretrainConfig(
        output_dir=os.path.join(root, out_tag),
        per_device_train_batch_size=2,  # global 8 over the 4-device mesh
        per_device_eval_batch_size=2,
        num_train_epochs=1,
        learning_rate=1e-3,
        save_steps=1.0,
        eval_steps=0.5,
        model_max_length=32,
        logging_steps=1,
    )
    mesh = make_mesh((-1, 1), ("data", "model"))
    trainer = PretrainTrainer(mc, args, ds(32, "tr"), ds(8, "ev"), tokenizer=tok, mesh=mesh)
    assert (trainer.metrics is None) == (pid != 0)
    trainer.train()

    out = {"pid": pid, "is_main": trainer.is_main}
    if trainer.is_main:
        losses = []
        with open(os.path.join(args.output_dir, "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if "train/loss" in rec:
                    losses.append(rec["train/loss"])
        out["losses"] = losses
    with open(os.path.join(root, f"worker_{out_tag}_{pid}.json"), "w") as f:
        json.dump(out, f)


def _tp_step_probe(root: str, out_tag: str, pid: int, nproc: int) -> None:
    """dp x tp over PROCESSES: a (2, 2) mesh where the model axis lives
    within each process's local devices and the data axis spans processes —
    the realistic pod layout (TP rides intra-host ICI, DP crosses hosts).
    Runs two fused MAFED windows + a collective orbax save/restore of the
    TP-sharded opt_state; losses must equal the single-process run of the
    SAME (2, 2) mesh program on 4 local devices."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from helpers import tiny_model_cfg

    from __graft_entry__ import _example_batch
    from mafed_tpu.core.config import TrainConfig
    from mafed_tpu.core.mesh import batch_sharding, make_mesh, shard_params
    from mafed_tpu.optim.optimizer import build_optimizer, set_schedule
    from mafed_tpu.optim.sched import linear_warmup_schedule
    from mafed_tpu.models import vl_pythia
    from mafed_tpu.training.step import make_mafed_window_step
    from mafed_tpu.training.train_state import TrainState, split_params

    mc = tiny_model_cfg()
    cfg = TrainConfig(
        batch_size=4, optim="adamw", weight_decay=0.01, grad_norm=2.0,
        replay_coeff=1.0, distillation_coeff=1.0,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="discounted",
    )
    mesh = make_mesh((-1, 2), ("data", "model"))
    assert mesh.devices.shape == (2, 2)
    params = shard_params(vl_pythia.init_params(mc, jax.random.PRNGKey(0)), mesh)
    tr, fz = split_params(params)
    tx = build_optimizer(cfg, tr, linear_warmup_schedule(1e-3, 2, 10))
    opt = set_schedule(tx.init(tr), 0, 0)
    state = TrainState(jnp.zeros((), jnp.int32), tr, fz, opt)
    teacher = jax.tree.map(lambda x: x.astype(jnp.bfloat16), tr)
    wstep = make_mafed_window_step(mc, cfg, tx, n_ce=1, attn_impl="xla", donate=False)

    bsh = batch_sharding(mesh)
    wsh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "data"))

    def place(global_np, sharding, window: bool):
        if nproc == 1:
            return jax.device_put(global_np, sharding)
        rows = slice(pid * 2, (pid + 1) * 2)
        local = global_np[:, rows] if window else global_np[rows]
        return jax.make_array_from_process_local_data(sharding, local)

    lang = jnp.full((mc.num_hidden_layers - 1,), 0.5, jnp.float32)
    losses = []
    for s in range(2):
        ce_np = {k: v[None] for k, v in _example_batch(mc, 4, 12, seed=10 + s).items()}
        db_np = _example_batch(mc, 4, 12, seed=20 + s)
        ce = {k: place(v, wsh, True) for k, v in ce_np.items()}
        db = {k: place(v, bsh, False) for k, v in db_np.items()}
        state, m = wstep(state, teacher, ce, db, lang)
        losses.append(float(m["loss"]))

    # collective save + restore of the TP-sharded opt_state (every process
    # writes/reads its addressable shards)
    ckptr = ocp.StandardCheckpointer()
    opt_dir = os.path.abspath(os.path.join(root, f"{out_tag}_opt_{nproc}"))
    ckptr.save(opt_dir, state.opt_state)
    ckptr.wait_until_finished()
    restored = ckptr.restore(opt_dir, state.opt_state)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))),
        state.opt_state, restored,
    )
    max_diff = max(jax.tree_util.tree_leaves(diffs))

    with open(os.path.join(root, f"worker_{out_tag}_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "losses": losses, "opt_roundtrip_max_diff": max_diff}, f)


if __name__ == "__main__":
    main()
