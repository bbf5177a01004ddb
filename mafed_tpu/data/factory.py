"""Task dataset/loader factories.

Parity: mafed/dataloaders.py — per-task train datasets concatenated over
image dirs (prepare_train_dataset, :86-107), all-task val loaders built once
(get_val_dataloaders, :61-83), split files resolved as
``{question_task_ids}/{exp}/{split}_question_ids.json`` with "valid" naming
for the val split (:9-11). The "joint" task gives multitask training
(MultitaskDataModule, :151-197).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List

from mafed_tpu.core.config import TrainConfig, VisionConfig
from mafed_tpu.data.collate import collate_train, collate_val
from mafed_tpu.data.loader import BatchLoader
from mafed_tpu.data.vqa_dataset import ConcatDataset, VQADataset


def task_split_file(question_task_ids_dir: str, exp_name: str, split: str) -> str:
    split = "valid" if split == "val" else split
    return os.path.join(question_task_ids_dir, exp_name, f"{split}_question_ids.json")


def _img_dirs_for(config: TrainConfig, task: str, dirs) -> List[str]:
    if isinstance(dirs, dict):
        return dirs[task]
    return dirs


def prepare_train_dataset(config: TrainConfig, task: str, tokenizer, vision_cfg: VisionConfig, synthetic_images: bool = False, vision_cache=None):
    datasets = [
        VQADataset(
            tokenizer=tokenizer,
            vision_cfg=vision_cfg,
            image_dirs=[img_dir],
            data_path=config.data_dir,
            split_file=task_split_file(config.question_task_ids, config.exp, "train"),
            task=task,
            split="train",
            max_txt_len=config.max_txt_len,
            synthetic_images=synthetic_images,
            vision_cache=vision_cache,
        )
        for img_dir in _img_dirs_for(config, task, config.train_img_dirs)
    ]
    return ConcatDataset(datasets)


def prepare_val_dataset(config: TrainConfig, task: str, tokenizer, vision_cfg: VisionConfig, synthetic_images: bool = False, vision_cache=None):
    datasets = [
        VQADataset(
            tokenizer=tokenizer,
            vision_cfg=vision_cfg,
            image_dirs=[img_dir],
            data_path=config.data_dir,
            split_file=task_split_file(config.question_task_ids, config.exp, "val"),
            task=task,
            split="val",
            max_txt_len=config.max_txt_len,
            synthetic_images=synthetic_images,
            vision_cache=vision_cache,
        )
        for img_dir in _img_dirs_for(config, task, config.val_img_dirs)
    ]
    return ConcatDataset(datasets)


def make_val_loader(config: TrainConfig, dataset, text_len: int) -> BatchLoader:
    """Validation loader. Multi-process runs shard examples over processes
    (each host scores its slice; validate_vqa sums the metric states across
    processes) — per-process decode is NOT collective, so unequal shard
    sizes are safe."""
    import jax

    n_proc = jax.process_count()
    return BatchLoader(
        dataset,
        batch_size=config.val_batch_size,
        collate=partial(collate_val, text_len=text_len),
        shuffle=False,
        num_workers=config.val_num_workers,
        drop_last=False,
        shard_id=jax.process_index() if n_proc > 1 else 0,
        num_shards=n_proc,
    )


def get_val_loaders(config: TrainConfig, tokenizer, vision_cfg: VisionConfig, text_len: int, synthetic_images: bool = False, vision_cache=None) -> Dict[str, BatchLoader]:
    """All-task validation loaders, built once (dataloaders.py:61-83)."""
    return {
        task: make_val_loader(
            config,
            prepare_val_dataset(config, task, tokenizer, vision_cfg, synthetic_images, vision_cache=vision_cache),
            text_len,
        )
        for task in config.tasks
    }
