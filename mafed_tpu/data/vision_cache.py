"""Disk-backed cache of frozen vision-tower features.

The EVA-02 encoder is FROZEN in every reference config
(mafed/model/vqa_cont_learner.py:201-203) and the image transform is
deterministic (bicubic resize + center crop + CLIP normalize,
mafed/train.py:95-104) — so an image's patch features NEVER change across
the entire continual-learning run. The reference still recomputes them for
every question at every epoch (and twice on distillation batches before its
teacher/student fusion); with ~3 questions per COCO image and 15 epochs per
task that is ~45 redundant vision forwards per image per task.

This cache stores `get_patch_embeddings` output (CLS dropped, pre-projector,
bf16 [n_patches, d_vis]) once per unique image. After a one-time priming
pass, training steps consume features directly: the vision tower (and host
JPEG decode) leaves the steady-state step entirely. Gradients are
bit-identical — the projector, which IS trainable, still applies inside the
differentiated forward.

Storage/atomicity/staleness: data/diskcache.py — the dir is stamped with a
digest of the frozen vision params at priming, so re-running in the same
output_dir with a different pretrained tower re-primes instead of serving
the old tower's features.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Tuple

import numpy as np

from mafed_tpu.data.diskcache import ArrayDiskCache


class VisionFeatureCache(ArrayDiskCache):
    def __init__(self, cache_dir: str, n_patches: int, dim: int) -> None:
        super().__init__(cache_dir, (n_patches, dim))
        self.n_patches = n_patches
        self.dim = dim


def leaf_datasets(dataset) -> List:
    """Unwrap ConcatDataset/Subset nesting to the VQADataset leaves."""
    if hasattr(dataset, "datasets"):
        out: List = []
        for d in dataset.datasets:
            out.extend(leaf_datasets(d))
        return out
    if hasattr(dataset, "dataset"):
        return leaf_datasets(dataset.dataset)
    return [dataset]


def prime_vision_cache(
    cache: VisionFeatureCache,
    datasets: Iterable,
    frozen_params: Dict,
    model_cfg,
    batch_size: int = 32,
    dtype=None,
) -> int:
    """One-time feature computation for every uncached unique image.

    Deduplicates by image key across datasets and examples (VQA has several
    questions per image), decodes misses on a thread pool, and runs ONE
    jitted vision forward per batch of unique images. Returns the number of
    images computed BY THIS PROCESS. Safe to re-run (no-ops on a warm cache);
    multi-process pods prime cooperatively — each miss is owned by exactly
    one process (stable key hash), atomic writes converge the shared dir,
    and an end-of-priming barrier orders priming before consumption.
    """
    import jax
    import jax.numpy as jnp

    from mafed_tpu.data.images import make_normalizer
    from mafed_tpu.models.vl_pythia import get_patch_embeddings

    if dtype is None:
        dtype = jnp.bfloat16
    # Canonicalize the tower to the COMPUTE dtype before fingerprinting and
    # computing: startup priming receives the f32 checkpoint tree while task
    # transitions receive state.frozen already cast to bf16 (runner.init_state)
    # — fingerprinting the raw leaves would read those as different weights
    # and wipe the warm cache at every task transition. Casting first makes
    # the fingerprint AND the stored features bit-identical across both
    # entry points (the in-step path consumes the bf16 tree).
    vision_tree = {"vision": frozen_params["vision"]}
    if jax.process_count() > 1:
        # priming dispatch is per-process (each process fills the shared dir
        # independently); globally-sharded frozen params must come down to a
        # process-local placement first
        from mafed_tpu.evaluation.validate import localize_params

        vision_tree = localize_params(
            vision_tree, jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        )

    @jax.jit
    def _canonical(t):
        return jax.tree.map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, t
        )

    vision_tree = _canonical(jax.tree.map(jnp.asarray, vision_tree))

    # staleness guard BEFORE the membership scan: features are a function of
    # the frozen tower weights; a dir primed by different weights (same
    # output_dir, new pretrained base) is wiped and re-primed
    from mafed_tpu.data.diskcache import params_fingerprint, set_fingerprint_coordinated

    set_fingerprint_coordinated(cache, "vision:" + params_fingerprint(vision_tree))
    # gather unique uncached keys -> a loader closure per key
    jobs: Dict[str, Tuple] = {}
    for ds in datasets:
        for leaf in leaf_datasets(ds):
            if not hasattr(leaf, "image_key"):
                continue
            for i in range(len(leaf)):
                key = leaf.image_key(i)
                if key not in jobs and not cache.has(key):
                    jobs[key] = (leaf, i)

    items = list(jobs.items())
    n_proc = jax.process_count()
    if n_proc > 1:
        # cooperative pod priming: each miss is computed by exactly ONE
        # process (stable key-hash ownership, diskcache.shard_owner) instead
        # of every process recomputing every image — the shared dir (the same
        # one orbax checkpoints already require) converges via atomic writes,
        # and the barrier below keeps peers from consuming a half-primed dir
        from mafed_tpu.data.diskcache import shard_owner

        proc = jax.process_index()
        items = [kv for kv in items if shard_owner(kv[0], n_proc) == proc]

    n_done = 0
    if items:
        # already ON DEVICE (the canonical cast above ran under jit): jit
        # re-uploads numpy ARGUMENTS on every dispatch, which would re-ship the
        # tower once per chunk below — and the bf16 cast halves that footprint
        params = vision_tree
        normalize = make_normalizer(model_cfg.vision)

        # params must be an ARGUMENT of the jitted fn: closure-captured device
        # arrays become baked-in constants (oversized compile payloads on
        # remote-compile TPU tunnels)
        @jax.jit
        def feats_fn(p, pixels_u8):
            return get_patch_embeddings(p, model_cfg, normalize(pixels_u8, dtype=dtype), dtype=dtype, attn_impl="xla")

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=8) as pool:
            for start in range(0, len(items), batch_size):
                chunk = items[start : start + batch_size]
                pixels = list(pool.map(lambda kv: kv[1][0].load_pixels(kv[1][1]), chunk))
                px = np.stack(pixels)
                if len(chunk) < batch_size:  # pad to the compiled batch
                    px = np.concatenate([px, np.repeat(px[-1:], batch_size - len(chunk), axis=0)])
                feats = np.asarray(feats_fn(params, px))
                for j, (key, _) in enumerate(chunk):
                    cache.save(key, feats[j])
                n_done += len(chunk)
    if n_proc > 1:
        # unconditional: a process whose shard (or scan) came up empty must
        # still wait for peers before training reads the cache
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("vision_cache_primed")
    return n_done
