"""Device-resident vision feature table (data/vision_table.py): loaders ship
int32 row indices, steps gather rows from an HBM-resident table — must be
value-identical to streaming the cached patch features, across the plain
item path, fused-window stacking, DP-sharded stacking, and end-to-end runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.helpers import tiny_model_cfg, write_synthetic_vqa

from mafed_tpu.data import vision_table as vt
from mafed_tpu.data.vision_cache import VisionFeatureCache, prime_vision_cache


def _primed(tmp_path, task="taskA"):
    from mafed_tpu.data.factory import prepare_train_dataset
    from mafed_tpu.data.tokenizer import ByteTokenizer
    from mafed_tpu.models import vl_pythia
    from mafed_tpu.training.train_state import split_params

    model_cfg = tiny_model_cfg()
    cfg = write_synthetic_vqa(str(tmp_path))
    vis = model_cfg.vision
    cache = VisionFeatureCache(str(tmp_path / "vc"), vis.num_patches, vis.embed_dim)
    ds = prepare_train_dataset(cfg, task, ByteTokenizer(), vis, synthetic_images=True, vision_cache=cache)
    params = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0))
    _, frozen = split_params(params)
    prime_vision_cache(cache, [ds], frozen, model_cfg, batch_size=8)
    return model_cfg, cfg, cache, ds


def test_items_ship_rows_and_gather_matches_stream(tmp_path):
    model_cfg, cfg, cache, ds = _primed(tmp_path)
    streamed = [ds[i]["patches"] for i in range(4)]

    keys = []
    seen = set()
    for k in vt.iter_image_keys([ds]):
        if k not in seen:
            seen.add(k)
            keys.append(k)
    table = vt.build_table(cache, keys)
    leaves = vt.attach([ds], table)
    assert leaves, "attach found no leaf datasets"

    item = ds[0]
    assert "patch_idx" in item and "patches" not in item and "pixels" not in item

    from mafed_tpu.data.collate import collate_train

    batch = collate_train([ds[i] for i in range(4)], text_len=16)
    assert batch["patch_idx"].dtype == np.int32 and batch["patch_idx"].shape == (4,)

    resolved = table.resolve(dict(batch))
    got = np.asarray(resolved["patches"], np.float32)
    want = np.stack([np.asarray(s, np.float32) for s in streamed])
    np.testing.assert_array_equal(got, want)
    # host-side resolve (teacher-cache priming path) agrees
    host = table.resolve_host(dict(batch))
    np.testing.assert_array_equal(np.asarray(host["patches"], np.float32), want)

    vt.attach([ds], None)
    assert "patches" in ds[0]


def test_int8_table_halves_budget_and_bounds_error(tmp_path):
    """--vision_table_dtype int8 (VERDICT r3 #4b): ~2x rows per MB, per-patch
    symmetric quantization bounded at <=1/127 of each patch vector's absmax,
    device and host resolves agree."""
    model_cfg, cfg, cache, ds = _primed(tmp_path)
    keys = list(dict.fromkeys(vt.iter_image_keys([ds])))
    n_p, dim = model_cfg.vision.num_patches, model_cfg.vision.embed_dim

    # at production dim (1024) int8 rows are ~2x denser; at this toy dim the
    # 4-byte scale is a larger fraction, so just require a strict shrink here
    assert vt.table_nbytes(1, 256, 1024, dtype="int8") < vt.table_nbytes(1, 256, 1024) / 1.9
    assert vt.table_nbytes(1, n_p, dim, dtype="int8") < vt.table_nbytes(1, n_p, dim)

    t16 = vt.build_table(cache, keys)
    t8 = vt.build_table(cache, keys, dtype="int8")
    assert t8.nbytes < t16.nbytes / 1.7

    from mafed_tpu.data.collate import collate_train

    vt.attach([ds], t8)
    batch = collate_train([ds[i] for i in range(4)], text_len=16)
    exact = np.asarray(t16.resolve(dict(batch))["patches"], np.float32)
    quant = np.asarray(t8.resolve(dict(batch))["patches"], np.float32)
    # per-(row, patch) error bound: half an int8 step of that patch's absmax,
    # plus bf16 rounding of the dequant product
    bound = np.abs(exact).max(axis=-1, keepdims=True) / 127.0 + 1e-6
    assert (np.abs(exact - quant) <= bound).all()
    host = np.asarray(t8.resolve_host(dict(batch))["patches"], np.float32)
    np.testing.assert_allclose(host, quant, atol=np.abs(exact).max() / 100)
    vt.attach([ds], None)


def test_int8_table_e2e_accuracy_matches_bf16(tmp_path):
    """2-task featdistill sequence with int8 vision-table rows: same accuracy
    matrix as the value-identical bf16 table (quantization must not move the
    metric at all on a tiny run)."""
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    def run(tag, dtype):
        cfg = write_synthetic_vqa(str(tmp_path / tag))
        cfg = cfg.replace(
            cl_method="featdistill",
            cl_memory=8,
            replay_interval=2,
            accumulate_grad_batches=2,
            distillation_modality_weighing_strategy="balanced",
            distillation_layer_weighing_strategy="discounted",
            distillation_layer_discount=0.5,
            vision_table_dtype=dtype,
            output_dir=str(tmp_path / tag / "out"),
        )
        trainer = ContinualLearningTrainer(
            cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
        )
        return trainer.main()

    r8 = run("i8", "int8")
    r16 = run("b16", "bfloat16")
    np.testing.assert_allclose(
        np.asarray(r8["accuracy_matrix"]), np.asarray(r16["accuracy_matrix"]), atol=1e-9
    )


test_int8_table_e2e_accuracy_matches_bf16 = pytest.mark.slow(
    test_int8_table_e2e_accuracy_matches_bf16
)


def test_collate_rejects_mixed_rows():
    from mafed_tpu.data.collate import collate_train

    a = {"input_ids": np.ones(3, np.int32), "labels": np.asarray([-100, 1, 2], np.int32),
         "patch_idx": np.int32(0)}
    b = {"input_ids": np.ones(3, np.int32), "labels": np.asarray([-100, 1, 2], np.int32),
         "patches": np.zeros((4, 8), np.float32)}
    with pytest.raises(ValueError, match="mixes vision-table"):
        collate_train([a, b], text_len=8)


def test_stack_window_resolves_rows_sharded(tmp_path, eight_devices):
    """Fused-window stacking under a (8,) data mesh: idx batches stack to
    [n_mb, B] laid out P(None, 'data'), the gather output matches streamed
    patches and stays sharded over 'data'."""
    from mafed_tpu.core.config import TrainConfig
    from mafed_tpu.core.mesh import make_mesh
    from mafed_tpu.data.tokenizer import ByteTokenizer
    from mafed_tpu.trainer.runner import TaskRunner

    model_cfg, cfg, cache, ds = _primed(tmp_path)
    mesh = make_mesh((8,), ("data",))
    runner = TaskRunner(model_cfg, cfg.replace(batch_size=8), ByteTokenizer(), mesh=mesh)

    keys = list(dict.fromkeys(vt.iter_image_keys([ds])))
    table = vt.build_table(cache, keys, mesh=mesh)
    runner.vision_table = table

    rng = np.random.default_rng(0)
    idx_batches = []
    want = []
    for _ in range(2):  # 2 microbatches of 8
        rows = rng.integers(0, len(keys), size=8)
        idx_batches.append({"patch_idx": rows.astype(np.int32)})
        want.append(table.host[rows])
    stacked = runner.stack_window(idx_batches)
    assert "patch_idx" not in stacked
    got = np.asarray(stacked["patches"], np.float32)
    np.testing.assert_array_equal(got, np.stack(want).astype(np.float32))
    # batch dim sharded over data; microbatch + feature dims replicated
    spec = stacked["patches"].sharding.spec
    assert tuple(spec)[:2] == (None, "data")


def test_validate_resolves_table_rows(tmp_path):
    """Decode batches carrying patch_idx are resolved through validate_vqa's
    `resolve` hook: the stub decoder must see gathered patches identical to
    what streaming collate would have shipped."""
    from mafed_tpu.data.collate import collate_val
    from mafed_tpu.data.loader import BatchLoader
    from mafed_tpu.evaluation.validate import validate_vqa
    from mafed_tpu.data.tokenizer import ByteTokenizer

    model_cfg, cfg, cache, ds = _primed(tmp_path)
    streamed = [ds[i]["patches"] for i in range(len(ds))]

    keys = list(dict.fromkeys(vt.iter_image_keys([ds])))
    table = vt.build_table(cache, keys)
    vt.attach([ds], table)

    loader = BatchLoader(ds, batch_size=4, collate=lambda items: collate_val(items, text_len=16),
                         shuffle=False, seed=0)
    seen = []

    def decoder(params, batch):
        assert "patch_idx" not in batch and "patches" in batch
        seen.append(np.asarray(batch["patches"], np.float32))
        return np.zeros((batch["input_ids"].shape[0], 4), np.int32)

    validate_vqa({}, decoder, loader, ByteTokenizer(), batch_size=4,
                 resolve=table.resolve)
    got = np.concatenate(seen)[: len(ds)]
    want = np.stack([np.asarray(s, np.float32) for s in streamed])
    np.testing.assert_array_equal(got, want)
    vt.attach([ds], None)


def test_resolve_local_matches_collective(tmp_path, eight_devices):
    """resolve_local (multi-process eval decode, where dispatch must stay
    non-collective): gathering through a table re-placed on a local sharding
    returns the same rows as the mesh-collective resolve, and the re-placed
    copy is cached per sharding (one device_put, not one per batch)."""
    model_cfg, cfg, cache, ds = _primed(tmp_path)
    keys = list(dict.fromkeys(vt.iter_image_keys([ds])))

    from mafed_tpu.core.mesh import make_mesh

    mesh = make_mesh((8,), ("data",))
    table = vt.build_table(cache, keys, mesh=mesh)
    local = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])

    rows = np.asarray([2, 0, 1, 2], np.int32)
    got = table.resolve_local({"patch_idx": rows}, local)["patches"]
    want = table.resolve({"patch_idx": rows})["patches"]
    np.testing.assert_array_equal(np.asarray(got, np.float32), np.asarray(want, np.float32))
    placed = table._local
    table.resolve_local({"patch_idx": rows}, local)
    assert table._local is placed  # cached, not re-shipped per batch


def test_table_tiers_include_val_when_budget_allows(tmp_path, monkeypatch):
    """Tier selection: a budget that fits train+val attaches the val sets; a
    budget that only fits train+memory leaves val streaming. Synthetic val
    sets are sized LARGER than train so they contribute distinct image keys
    (synthetic keys are per-index)."""
    from mafed_tpu.trainer.continual import ContinualLearningTrainer
    from mafed_tpu.data.factory import get_val_loaders, prepare_train_dataset

    cfg = write_synthetic_vqa(str(tmp_path), n_train=8, n_val=16)
    cfg = cfg.replace(cl_method="naive", output_dir=str(tmp_path / "out"))
    trainer = ContinualLearningTrainer(
        cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    )
    trainer.val_loaders = get_val_loaders(
        cfg, trainer.tokenizer, trainer.model_cfg.vision, trainer.runner.val_text_len,
        synthetic_images=True, vision_cache=trainer.vision_cache,
    )
    ds = prepare_train_dataset(
        cfg, "taskA", trainer.tokenizer, trainer.model_cfg.vision,
        synthetic_images=True, vision_cache=trainer.vision_cache,
    )
    params = trainer._initial_params()
    trainer._prime_vision_cache(params, [ds])
    trainer._prime_vision_cache(params, [l.dataset for l in trainer.val_loaders.values()])

    class S:
        datasets = []

    n_train = len(set(vt.iter_image_keys([ds])))  # 8
    monkeypatch.setattr(vt, "table_nbytes", lambda n, p, d, **kw: n * (1 << 20))  # 1 MB/key
    val_ds = trainer.val_loaders["taskA"].dataset

    trainer.config = cfg.replace(device_vision_table_mb=1024)
    trainer._refresh_vision_table(S(), ds, "taskA")
    table = trainer.runner.vision_table
    assert table is not None and len(table) > n_train  # val keys included
    assert "patch_idx" in val_ds[0]

    # budget that fits the train set but not train+val: val streams
    trainer.config = cfg.replace(device_vision_table_mb=n_train)
    trainer._refresh_vision_table(S(), ds, "taskA")
    table = trainer.runner.vision_table
    assert table is not None and len(table) == n_train
    assert "patches" in val_ds[0]
    assert "patch_idx" in ds[0]


def test_over_budget_falls_back_to_streaming(tmp_path, monkeypatch):
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    cfg = write_synthetic_vqa(str(tmp_path))
    cfg = cfg.replace(cl_method="naive", output_dir=str(tmp_path / "out"))
    trainer = ContinualLearningTrainer(
        cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
    )
    from mafed_tpu.data.factory import prepare_train_dataset

    ds = prepare_train_dataset(
        cfg, "taskA", trainer.tokenizer, trainer.model_cfg.vision,
        synthetic_images=True, vision_cache=trainer.vision_cache,
    )
    trainer._prime_vision_cache(trainer._initial_params(), [ds])

    class S:  # strategy stub with no memory
        datasets = []

    trainer._refresh_vision_table(S(), ds)
    assert trainer.runner.vision_table is not None
    assert "patch_idx" in ds[0]

    # a task over the HBM budget detaches everything and streams
    monkeypatch.setattr(vt, "table_nbytes", lambda *a, **kw: 10**15)
    trainer._refresh_vision_table(S(), ds)
    assert trainer.runner.vision_table is None
    assert "patches" in ds[0]


@pytest.mark.slow
def test_e2e_featdistill_table_matches_streaming(tmp_path):
    """Full 2-task MAFED sequence (fused windows + replay memory + teacher):
    the device table must be bit-identical to streaming — the gather returns
    the same bf16 rows the collate would have stacked."""
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    def run(tag, table_mb):
        cfg = write_synthetic_vqa(str(tmp_path / tag))
        cfg = cfg.replace(
            cl_method="featdistill",
            cl_memory=8,
            replay_interval=2,
            accumulate_grad_batches=2,
            distillation_modality_weighing_strategy="balanced",
            distillation_layer_weighing_strategy="discounted",
            distillation_layer_discount=0.5,
            device_vision_table_mb=table_mb,
            output_dir=str(tmp_path / tag / "out"),
        )
        trainer = ContinualLearningTrainer(
            cfg, model_cfg=tiny_model_cfg(), synthetic_images=True, use_mesh=False
        )
        return trainer.main()

    r_table = run("table", 1024)
    r_stream = run("stream", 0)
    np.testing.assert_allclose(
        np.asarray(r_table["accuracy_matrix"]),
        np.asarray(r_stream["accuracy_matrix"]),
        atol=1e-9,
    )
