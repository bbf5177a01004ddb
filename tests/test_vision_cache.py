"""Vision feature cache (data/vision_cache.py): the frozen EVA-02 tower's
features are deterministic per image, so caching them once and feeding
"patches" batches must be numerically equivalent to in-step vision — and
the steady-state step must contain no vision tower at all.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import tiny_model_cfg, write_synthetic_vqa

from mafed_tpu.data.vision_cache import VisionFeatureCache, leaf_datasets, prime_vision_cache


def test_cache_roundtrip_bf16_exact(tmp_path):
    cache = VisionFeatureCache(str(tmp_path), n_patches=4, dim=8)
    feats = np.asarray(jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)), jnp.bfloat16))
    assert not cache.has("img:a")
    cache.save("img:a", feats)
    assert cache.has("img:a")
    out = cache.load("img:a")
    np.testing.assert_array_equal(np.asarray(out, np.float32), np.asarray(feats, np.float32))


def test_collate_rejects_mixed_vision_batches():
    from mafed_tpu.data.collate import collate_train

    a = {"input_ids": np.ones(3, np.int32), "labels": np.asarray([-100, 1, 2], np.int32),
         "pixels": np.zeros((4, 4, 3), np.uint8)}
    b = dict(a)
    b = {**a, "patches": np.zeros((4, 8), np.float32)}
    del b["pixels"]
    with pytest.raises(ValueError, match="mixes cached"):
        collate_train([a, b], text_len=8)


def _tiny_trainer(tmp_path, use_cache: bool, tag: str):
    from mafed_tpu.trainer.continual import ContinualLearningTrainer

    cfg = write_synthetic_vqa(str(tmp_path / tag))
    cfg.vision_cache = use_cache
    cfg.cl_method = "naive"
    cfg.epochs = [1, 1]
    return ContinualLearningTrainer(cfg, model_cfg=tiny_model_cfg(), synthetic_images=True)


@pytest.mark.slow
def test_e2e_cached_matches_uncached_and_skips_vision(tmp_path):
    r_cached = _tiny_trainer(tmp_path, True, "cached").main()
    r_plain = _tiny_trainer(tmp_path, False, "plain").main()
    a, b = np.asarray(r_cached["accuracy_matrix"]), np.asarray(r_plain["accuracy_matrix"])
    # same features modulo bf16 fusion-order differences -> same greedy
    # decodes on the tiny model
    np.testing.assert_allclose(a, b, atol=2e-2)
    # warm-cache rerun is exactly reproducible
    r_again = _tiny_trainer(tmp_path, True, "cached2").main()
    # (cache dir differs per run; priming recomputes deterministically)
    np.testing.assert_allclose(np.asarray(r_again["accuracy_matrix"]), a, atol=1e-9)


def test_cached_window_step_compiles_without_vision_tower():
    """Steady state really removes the tower: the compiled CE-window HLO on a
    patches batch contains no convolution (the EVA-02 patch-embed conv is the
    only conv in the model)."""
    from mafed_tpu.core.config import TrainConfig
    from mafed_tpu.models import vl_pythia
    from mafed_tpu.optim.optimizer import build_optimizer
    from mafed_tpu.optim.sched import linear_warmup_schedule
    from mafed_tpu.training.step import make_ce_window_step
    from mafed_tpu.training.train_state import TrainState, split_params

    mc = tiny_model_cfg()
    cfg = TrainConfig(batch_size=2, accumulate_grad_batches=1, optim="adamw", weight_decay=0.01)
    params = vl_pythia.init_params(mc, jax.random.PRNGKey(0))
    tr, fz = split_params(params)
    tx = build_optimizer(cfg, tr, linear_warmup_schedule(1e-3, 2, 100))
    state = TrainState(jnp.zeros((), jnp.int32), tr, fz, tx.init(tr))
    step = make_ce_window_step(mc, cfg, tx, donate=False)

    n_mb, b, t = 2, 2, 16
    vis = mc.vision
    batches = {
        "input_ids": np.ones((n_mb, b, t), np.int32),
        "attention_mask": np.ones((n_mb, b, t), np.int32),
        "labels": np.full((n_mb, b, t), -100, np.int32),
        "patches": np.zeros((n_mb, b, vis.num_patches, vis.embed_dim), np.float32),
    }
    batches["labels"][:, :, -4:] = 1
    lowered = step.lower(state, batches)
    hlo = lowered.as_text()
    assert "convolution" not in hlo
    # and the pixels path DOES contain it
    pix = {k: v for k, v in batches.items() if k != "patches"}
    pix["pixels"] = np.zeros((n_mb, b, vis.img_size, vis.img_size, 3), np.uint8)
    assert "convolution" in step.lower(state, pix).as_text()


def test_prime_and_dataset_emit_patches(tmp_path):
    from mafed_tpu.data.factory import prepare_train_dataset
    from mafed_tpu.data.tokenizer import ByteTokenizer
    from mafed_tpu.models import vl_pythia
    from mafed_tpu.training.train_state import split_params

    model_cfg = tiny_model_cfg()
    cfg = write_synthetic_vqa(str(tmp_path))
    vis = model_cfg.vision
    cache = VisionFeatureCache(str(tmp_path / "vc"), vis.num_patches, vis.embed_dim)
    ds = prepare_train_dataset(cfg, "taskA", ByteTokenizer(), vis, synthetic_images=True, vision_cache=cache)
    assert "pixels" in ds[0] and "patches" not in ds[0]

    params = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0))
    _, frozen = split_params(params)
    n = prime_vision_cache(cache, [ds], frozen, model_cfg, batch_size=8)
    assert n == len(ds)  # synthetic: one unique image per example
    assert prime_vision_cache(cache, [ds], frozen, model_cfg) == 0  # warm no-op

    item = ds[0]
    assert "patches" in item and "pixels" not in item
    assert item["patches"].shape == (vis.num_patches, vis.embed_dim)
    # cached features == in-step features for the same image
    leaf = leaf_datasets(ds)[0]
    from mafed_tpu.data.images import make_normalizer

    px = leaf.load_pixels(0)[None]
    ref = vl_pythia.get_patch_embeddings(
        {"vision": frozen["vision"]}, model_cfg,
        make_normalizer(vis)(jnp.asarray(px)), dtype=jnp.bfloat16, attn_impl="xla",
    )[0]
    np.testing.assert_array_equal(
        np.asarray(item["patches"], np.float32), np.asarray(ref, np.float32)
    )


def test_fingerprint_stable_across_param_dtype(tmp_path):
    """Startup primes with the f32 checkpoint tree; task transitions re-prime
    with state.frozen already cast to bf16 (runner.init_state). Both must
    fingerprint identically — otherwise every task transition would WIPE the
    warm cache, deleting the replay-memory features mid-run."""
    from mafed_tpu.data.factory import prepare_train_dataset
    from mafed_tpu.data.tokenizer import ByteTokenizer
    from mafed_tpu.models import vl_pythia
    from mafed_tpu.training.train_state import split_params

    model_cfg = tiny_model_cfg()
    cfg = write_synthetic_vqa(str(tmp_path))
    vis = model_cfg.vision
    cache = VisionFeatureCache(str(tmp_path / "vc"), vis.num_patches, vis.embed_dim)
    ds = prepare_train_dataset(cfg, "taskA", ByteTokenizer(), vis, synthetic_images=True, vision_cache=cache)
    params = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(0))  # f32
    _, frozen = split_params(params)
    assert prime_vision_cache(cache, [ds], frozen, model_cfg, batch_size=8) == len(ds)

    frozen_bf16 = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), frozen)
    assert prime_vision_cache(cache, [ds], frozen_bf16, model_cfg, batch_size=8) == 0
    assert cache.has(leaf_datasets(ds)[0].image_key(0))  # warm entries survived

    # genuinely different weights DO wipe + recompute
    params2 = vl_pythia.init_params(model_cfg, jax.random.PRNGKey(1))
    _, frozen2 = split_params(params2)
    assert prime_vision_cache(cache, [ds], frozen2, model_cfg, batch_size=8) == len(ds)


def test_image_key_distinguishes_same_fname_in_different_dirs(tmp_path):
    """Same-named files under different image_dirs must not share a cache
    key — a bare-filename key would silently serve one task's features for
    the other task's (different) image."""
    from PIL import Image

    from mafed_tpu.data.vqa_dataset import VQADataset

    fname = "000001.jpg"
    dirs = []
    rng = np.random.default_rng(0)
    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8).astype(np.uint8)).save(
            str(d / fname)
        )
        dirs.append(str(d))

    def bare(image_dirs):
        ds = VQADataset.__new__(VQADataset)
        ds.synthetic_images = False
        ds.image_dirs = list(image_dirs)
        ds._resolved = {}
        ds.store = [{"img_fname": fname}]
        return ds

    ka = bare([dirs[0]]).image_key(0)
    kb = bare([dirs[1]]).image_key(0)
    assert ka != kb
    assert dirs[0] in ka and dirs[1] in kb
    # stable across calls (memoized) and equal for datasets sharing a dir
    assert bare([dirs[0]]).image_key(0) == ka
