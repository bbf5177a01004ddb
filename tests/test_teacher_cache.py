"""Teacher-state cache (data/teacher_cache.py): the frozen per-task teacher's
hidden states over the fixed memory set are computed once at task transition;
steady-state distill steps consume them and skip the teacher forward.
Equivalence: cached and in-step teacher must produce the same training."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mafed_tpu.core.config import TrainConfig
from mafed_tpu.data.teacher_cache import TeacherStateCache, TeacherStateView
from mafed_tpu.models import vl_pythia
from mafed_tpu.optim.optimizer import build_optimizer
from mafed_tpu.optim.sched import linear_warmup_schedule
from mafed_tpu.training.step import make_distill_step
from mafed_tpu.training.train_state import TrainState, split_params
from tests.helpers import tiny_model_cfg, write_synthetic_vqa
from __graft_entry__ import _example_batch


def test_cache_roundtrip_and_generation_cleanup(tmp_path):
    base = str(tmp_path / "tc")
    c0 = TeacherStateCache(base, generation=0, n_states=3, seq_len=8, hidden=4)
    rng = np.random.default_rng(0)
    states = rng.standard_normal((3, 8, 4)).astype(np.float32)
    c0.save("q1", states)
    assert c0.has("q1") and not c0.has("q2")
    back = np.asarray(c0.load("q1"), np.float32)
    # bf16 storage: exact after a bf16 roundtrip of the input
    np.testing.assert_array_equal(back, np.asarray(jnp.asarray(states, jnp.bfloat16), np.float32))
    with pytest.raises(ValueError):
        c0.save("bad", np.zeros((2, 8, 4), np.float32))

    c1 = TeacherStateCache(base, generation=1, n_states=3, seq_len=8, hidden=4)
    c1.drop_older_generations()
    assert not os.path.isdir(c0.dir)
    assert not c1.has("q1")  # generations are keyed apart


def test_view_attaches_states(tmp_path):
    cache = TeacherStateCache(str(tmp_path), generation=0, n_states=2, seq_len=4, hidden=3)
    cache.save("qA", np.ones((2, 4, 3), np.float32))

    class Tiny:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {"question_id": ["qA", "qB"][i], "x": i}

    view = TeacherStateView(Tiny(), cache)
    assert "t_hs" in view[0] and view[0]["t_hs"].shape == (2, 4, 3)
    assert "t_hs" not in view[1]  # miss stays absent (collate hard-fails on mixes)


def test_device_table_gather_matches_streamed_states(tmp_path):
    """HBM tier == streaming tier, bit-for-bit: the table gather returns
    exactly the bf16 rows the TeacherStateView would have streamed."""
    from mafed_tpu.data.collate import collate_train
    from mafed_tpu.data.teacher_cache import (
        DeviceTeacherTable,
        TeacherIndexView,
        build_teacher_table,
        teacher_table_nbytes,
    )

    cache = TeacherStateCache(str(tmp_path), generation=0, n_states=2, seq_len=4, hidden=3)
    rng = np.random.default_rng(3)
    qids = ["q0", "q1", "q2"]
    per_q = {q: rng.standard_normal((2, 4, 3)).astype(np.float32) for q in qids}
    for q, s in per_q.items():
        cache.save(q, s)

    table = build_teacher_table(cache, qids, mesh=None)
    assert isinstance(table, DeviceTeacherTable)
    assert table.nbytes == teacher_table_nbytes(3, 2, 4, 3)

    class Tiny:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return {
                "question_id": qids[i],
                "input_ids": [1, 2],
                "labels": [-100, 2],
                "patches": np.zeros((2, 3), np.float32),
            }

    idx_view = TeacherIndexView(Tiny(), table)
    st_view = TeacherStateView(Tiny(), cache)
    items_idx = [idx_view[i] for i in (2, 0, 1)]
    items_st = [st_view[i] for i in (2, 0, 1)]
    b_idx = collate_train(items_idx, text_len=4)
    b_st = collate_train(items_st, text_len=4)
    assert b_idx["t_idx"].tolist() == [2, 0, 1]
    resolved = table.resolve(b_idx)
    assert "t_idx" not in resolved
    np.testing.assert_array_equal(
        np.asarray(resolved["t_hs"], np.float32), b_st["t_hs"].astype(np.float32)
    )


def _counting_dataset(loads, qids=("q0", "q1", "q2")):
    class Counting:
        def __len__(self):
            return len(qids)

        def __getitem__(self, i):
            loads.append(i)
            return {"question_id": qids[i]}

        def question_id(self, i):
            return qids[i]

    return Counting()


def test_membership_scan_is_metadata_only(tmp_path):
    """prime_teacher_cache's cache-hit scan must read question ids via the
    metadata-only accessor — a fully-primed memory set of N examples must not
    pay N image loads per task transition (vqa_dataset.question_id_of)."""
    from mafed_tpu.data.teacher_cache import prime_teacher_cache, teacher_fingerprint
    from mafed_tpu.data.vqa_dataset import Subset, question_id_of

    loads = []
    cache = TeacherStateCache(str(tmp_path), generation=0, n_states=2, seq_len=4, hidden=3)
    cache.set_fingerprint(teacher_fingerprint(None, None))  # this run's teacher
    for i in range(3):
        cache.save(f"q{i}", np.zeros((2, 4, 3), np.float32))
    n = prime_teacher_cache(
        cache, Subset(_counting_dataset(loads), [0, 1, 2]), None, None, None,
        collate=None, deepest_tap=1,
    )
    assert n == 0 and loads == []
    assert question_id_of(_counting_dataset([]), 1) == "q1"


def test_stale_fingerprint_wipes_cache(tmp_path):
    """A cache dir primed by DIFFERENT params (previous run, same output_dir)
    must be wiped, not served (diskcache.set_fingerprint)."""
    cache = TeacherStateCache(str(tmp_path), generation=0, n_states=2, seq_len=4, hidden=3)
    cache.set_fingerprint("teacher:run-A")
    cache.save("q0", np.ones((2, 4, 3), np.float32))
    assert cache.has("q0")
    # same params: stamp is idempotent, entries survive
    assert cache.set_fingerprint("teacher:run-A") is False and cache.has("q0")
    # different params (fresh run in the same output_dir): wiped
    assert cache.set_fingerprint("teacher:run-B") is True and not cache.has("q0")
    # legacy unstamped dir with entries: also wiped
    cache.save("q1", np.ones((2, 4, 3), np.float32))
    os.remove(os.path.join(cache.cache_dir, "fingerprint.json"))
    assert cache.set_fingerprint("teacher:run-B") is True and not cache.has("q1")


def test_load_decodes_uint16_without_ml_dtypes(tmp_path, monkeypatch):
    """An entry written WITH ml_dtypes (uint16-viewed bf16) read by an
    environment without it must widen the bf16 bit pattern exactly — a raw
    .view(float32) would pair adjacent uint16s into garbage at half the
    last dim."""
    import mafed_tpu.data.diskcache as dc

    if dc._BF16 is np.float32:
        pytest.skip("ml_dtypes unavailable; nothing stored as uint16")
    cache = dc.ArrayDiskCache(str(tmp_path), (2, 3))
    vals = np.asarray([[1.5, -2.0, 0.25], [3.0, 0.0, -0.5]], np.float32)  # bf16-exact
    cache.save("k", vals)
    monkeypatch.setattr(dc, "_BF16", np.float32)
    out = cache.load("k")
    assert out.shape == (2, 3) and out.dtype == np.float32
    np.testing.assert_array_equal(out, vals)


def test_stamp_includes_shape(tmp_path):
    """Same weights under a different layout (e.g. select_feature patch ->
    cls_patch) produce differently-shaped entries: the shape is part of the
    stamp, so the dir is wiped instead of serving wrong-shape arrays."""
    from mafed_tpu.data.diskcache import ArrayDiskCache

    a = ArrayDiskCache(str(tmp_path), (2, 3))
    a.set_fingerprint("fp")
    a.save("k", np.zeros((2, 3), np.float32))
    b = ArrayDiskCache(str(tmp_path), (3, 3))
    assert b.set_fingerprint("fp") is True  # same params, new shape -> wipe
    assert not b.has("k")


@pytest.mark.parametrize("select_feature", ["patch", "cls_patch"])
def test_teacher_seq_len_matches_forward(select_feature):
    """The cache's expected seq_len must equal the VL forward's hidden-state
    length for BOTH projector input modes (cls_patch adds the CLS token)."""
    import dataclasses

    import jax.numpy as jnp

    from helpers import tiny_model_cfg
    from mafed_tpu.data.teacher_cache import teacher_seq_len
    from mafed_tpu.models import vl_pythia

    model_cfg = dataclasses.replace(tiny_model_cfg(), select_feature=select_feature)
    params = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0))
    text_len = 8
    out = vl_pythia.forward(
        params, model_cfg,
        jnp.ones((1, text_len), jnp.int32),
        jnp.zeros((1, 3, model_cfg.vision.img_size, model_cfg.vision.img_size), jnp.bfloat16),
        jnp.ones((1, text_len), jnp.int32), None,
        output_hidden_states=True, dtype=jnp.bfloat16, attn_impl="xla", need_logits=False,
    )
    assert out.hidden_states.shape[-2] == teacher_seq_len(model_cfg, text_len)


def test_params_fingerprint_tracks_content():
    from mafed_tpu.data.diskcache import params_fingerprint

    a = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    b = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    assert params_fingerprint(a) == params_fingerprint(b)
    b["w"] = b["w"] + 1e-3
    assert params_fingerprint(a) != params_fingerprint(b)
    assert params_fingerprint({"w": a["w"].reshape(3, 2)}) != params_fingerprint(a)


def test_priming_rejects_missing_or_duplicate_qids(tmp_path):
    """Without unique ids every example would collapse onto shared cache
    entries — priming must hard-fail, not silently mis-serve states."""
    from mafed_tpu.data.teacher_cache import prime_teacher_cache

    cache = TeacherStateCache(str(tmp_path), generation=0, n_states=2, seq_len=4, hidden=3)
    with pytest.raises(ValueError, match="question_id"):
        prime_teacher_cache(
            cache, _counting_dataset([], qids=("q0", None, "q2")), None, None, None,
            collate=None, deepest_tap=1,
        )
    with pytest.raises(ValueError, match="duplicate"):
        prime_teacher_cache(
            cache, _counting_dataset([], qids=("q0", "q1", "q0")), None, None, None,
            collate=None, deepest_tap=1,
        )


def test_priming_fingerprint_is_dtype_canonical(tmp_path):
    """The SAME weights must fingerprint identically whether they arrive as
    bf16 (state.frozen at an uninterrupted task transition) or as the f32
    safetensors reload of a preemption restart's skipped task — otherwise
    every restart wipes and fully re-primes the warm teacher cache."""
    from mafed_tpu.data.teacher_cache import prime_teacher_cache, teacher_seq_len

    model_cfg = tiny_model_cfg()
    trainable, frozen = split_params(vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0)))
    t_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    f_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)

    text_len = 16
    deepest = model_cfg.num_hidden_layers - 2
    cache = TeacherStateCache(
        str(tmp_path), generation=0, n_states=deepest + 1,
        seq_len=teacher_seq_len(model_cfg, text_len), hidden=model_cfg.hidden_size,
    )

    class DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {"question_id": f"q{i}"}

        def question_id(self, i):
            return f"q{i}"

    def collate(items):
        return {k: jnp.asarray(v) for k, v in _example_batch(model_cfg, len(items), text_len).items()}

    n1 = prime_teacher_cache(
        cache, DS(), t_bf16, f_bf16, model_cfg, collate=collate,
        deepest_tap=deepest, batch_size=2,
    )
    assert n1 == 2
    # f32 upcast of the same weights (bf16 -> f32 is exact): cache stays warm
    t_f32 = jax.tree.map(lambda x: x.astype(jnp.float32), t_bf16)
    f_f32 = jax.tree.map(lambda x: x.astype(jnp.float32), f_bf16)
    n2 = prime_teacher_cache(
        cache, DS(), t_f32, f_f32, model_cfg, collate=collate,
        deepest_tap=deepest, batch_size=2,
    )
    assert n2 == 0


def test_distill_step_cached_teacher_matches_in_step():
    """A distill step consuming precomputed t_hs must match the step that
    runs the teacher forward in-graph (same jitted teacher math)."""
    model_cfg = tiny_model_cfg()
    train_cfg = TrainConfig(
        batch_size=4, learning_rate=1e-3, optim="adamw",
        replay_coeff=1.0, distillation_coeff=1.0,
        distillation_modality_weighing_strategy="balanced",
        distillation_layer_weighing_strategy="discounted",
        distillation_layer_discount=0.5,
    )
    params_s = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0))
    params_t = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(7))
    params_t["vision"] = params_s["vision"]
    trainable, frozen = split_params(params_s)
    teacher_trainable, _ = split_params(params_t)
    tx = build_optimizer(train_cfg, trainable, linear_warmup_schedule(1e-3, 1, 100))

    batch = {k: jnp.asarray(v) for k, v in _example_batch(model_cfg, 4, 16).items()}
    lang_coeffs = jnp.full((model_cfg.num_hidden_layers - 1,), 0.5, jnp.float32)
    step = make_distill_step(model_cfg, train_cfg, tx, attn_impl="xla", donate=False)

    def fresh_state():
        t = jax.tree.map(jnp.array, trainable)
        return TrainState(jnp.zeros((), jnp.int32), t, frozen, tx.init(t))

    s_ref, m_ref = step(fresh_state(), teacher_trainable, batch, lang_coeffs)

    # precompute teacher states exactly as prime_teacher_cache does
    from mafed_tpu.data.images import prep_pixels
    from mafed_tpu.training.train_state import merge_params

    deepest = model_cfg.num_hidden_layers - 2
    px = prep_pixels({"pixels": batch["pixels"]}, model_cfg.vision, jnp.bfloat16)
    hs = vl_pythia.forward(
        merge_params(teacher_trainable, frozen), model_cfg,
        batch["input_ids"], px, batch["attention_mask"], None,
        output_hidden_states=True,
        dtype=jnp.bfloat16, attn_impl="xla", need_logits=False, num_layers=deepest,
    ).hidden_states
    cached_batch = dict(batch)
    # collate layout + the cache's bf16 storage roundtrip
    cached_batch["t_hs"] = jnp.moveaxis(hs, 0, 1).astype(jnp.bfloat16)

    s_c, m_c = step(fresh_state(), teacher_trainable, cached_batch, lang_coeffs)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_c["loss"]), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_ref.trainable), jax.tree.leaves(s_c.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("table_mb", [4096, 0], ids=["hbm-table", "streaming"])
def test_e2e_featdistill_teacher_cache_matches_uncached(tmp_path, table_mb):
    """2-task featdistill sequence with the teacher-state cache on vs off:
    same final checkpoints (the cache must be a pure work-removal) — in both
    tiers: the HBM table (device_teacher_table_mb budget, the default) and
    disk streaming (budget 0)."""
    from safetensors.numpy import load_file

    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    def run(out, cache_on):
        cfg = write_synthetic_vqa(str(tmp_path), tasks=("taskA", "taskB"), n_train=16, n_val=4)
        cfg = cfg.replace(
            cl_method="featdistill",
            cl_memory=8,
            replay_interval=4,
            distillation_coeff=1.0,
            replay_coeff=1.0,
            distillation_modality_weighing_strategy="balanced",
            distillation_layer_weighing_strategy="discounted",
            output_dir=out,
            epochs=[1, 2],
            accumulate_grad_batches=2,
            teacher_state_cache=cache_on,
            device_teacher_table_mb=table_mb,
            log_every=100,
        )
        r = ContinualLearningTrainer(
            cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
        ).main()
        return cfg, r

    cfg_on, r_on = run(os.path.join(str(tmp_path), f"on{table_mb}"), True)
    cfg_off, r_off = run(os.path.join(str(tmp_path), f"off{table_mb}"), False)

    # the cache was actually exercised
    assert os.path.isdir(os.path.join(cfg_on.output_dir, "teacher_cache", "gen0"))

    np.testing.assert_allclose(
        np.asarray(r_on["accuracy_matrix"]), np.asarray(r_off["accuracy_matrix"]), atol=1e-6
    )
    for task in ("taskA", "taskB"):
        a = load_file(os.path.join(cfg_on.output_dir, "ckpt", f"{task}_best.safetensors"))
        b = load_file(os.path.join(cfg_off.output_dir, "ckpt", f"{task}_best.safetensors"))
        for k in a:
            np.testing.assert_allclose(
                a[k].astype(np.float32), b[k].astype(np.float32),
                rtol=2e-3, atol=2e-3, err_msg=f"{task}:{k}",
            )


def test_resolve_teacher_cache_mode():
    """--teacher_state_cache tri-state (off/auto/on) with bool back-compat:
    True/False (tests, pre-r4 JSON configs) mean on/off."""
    from mafed_tpu.data.teacher_cache import resolve_teacher_cache_mode as resolve

    assert resolve(True) == "on" and resolve(False) == "off"
    assert resolve("auto") == "auto" and resolve("AUTO") == "auto"
    assert resolve("on") == "on" and resolve("off") == "off"
    assert resolve("1") == "on" and resolve("0") == "off"
    assert resolve("") == "off"
    with pytest.raises(ValueError):
        resolve("sometimes")


@pytest.mark.slow
def test_auto_mode_budget_policy(tmp_path):
    """"auto" (the default) engages the teacher cache ONLY when the memory
    set's states fit the device_teacher_table_mb HBM table; over budget it
    must keep the in-step teacher — never the streaming tier — and must not
    even prime the disk cache (canonical 4000-example memories would write
    ~63 GB nobody reads). Training must be invariant across all three
    (in-step teacher, auto+table, auto-over-budget): the cache is a pure
    work-removal (training/step.py per-microbatch equivalence)."""
    from safetensors.numpy import load_file

    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    def run(name, mode, table_mb):
        cfg = write_synthetic_vqa(str(tmp_path), tasks=("taskA", "taskB"), n_train=16, n_val=4)
        cfg = cfg.replace(
            cl_method="featdistill",
            cl_memory=8,
            replay_interval=4,
            distillation_coeff=1.0,
            replay_coeff=1.0,
            distillation_modality_weighing_strategy="balanced",
            distillation_layer_weighing_strategy="discounted",
            output_dir=os.path.join(str(tmp_path), name),
            epochs=[1, 2],
            accumulate_grad_batches=2,
            teacher_state_cache=mode,
            device_teacher_table_mb=table_mb,
            log_every=100,
        )
        r = ContinualLearningTrainer(
            cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
        ).main()
        return cfg, r

    cfg_off, r_off = run("off", "off", 4096)
    cfg_fit, r_fit = run("auto_fit", "auto", 4096)
    cfg_over, r_over = run("auto_over", "auto", 0)

    # under budget: primed + table engaged; over budget: no priming at all
    assert os.path.isdir(os.path.join(cfg_fit.output_dir, "teacher_cache", "gen0"))
    assert not os.path.isdir(os.path.join(cfg_over.output_dir, "teacher_cache"))

    for r in (r_fit, r_over):
        np.testing.assert_allclose(
            np.asarray(r["accuracy_matrix"]), np.asarray(r_off["accuracy_matrix"]), atol=1e-6
        )
    for task in ("taskA", "taskB"):
        base = load_file(os.path.join(cfg_off.output_dir, "ckpt", f"{task}_best.safetensors"))
        for cfg_x in (cfg_fit, cfg_over):
            other = load_file(os.path.join(cfg_x.output_dir, "ckpt", f"{task}_best.safetensors"))
            for k in base:
                np.testing.assert_allclose(
                    base[k].astype(np.float32), other[k].astype(np.float32),
                    rtol=2e-3, atol=2e-3, err_msg=f"{cfg_x.output_dir}:{task}:{k}",
                )
