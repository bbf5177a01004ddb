"""VQA dataset: question/answer formatting + tokenization + image loading.

Parity with mafed/data/vl_pythia_vqa_dataset.py:30-125:
  * question formatted strip/capitalize/add-fullstop (:107-125)
  * answer = normalized multiple_choice_answer, formatted w/o capitalize
  * train: input_ids = tok(question) ++ tok(answer) ++ [eos];
    labels = -100 over the question, answer+eos supervised (:73-83)
  * item carries 10 normalized ground-truth answers for the soft score

Items are plain numpy; batching/padding happens in collate (static shapes
for jit).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from mafed_tpu.constants import IGNORE_INDEX
from mafed_tpu.core.config import VisionConfig
from mafed_tpu.data.annotations import AnnotationStore
from mafed_tpu.data.images import get_image_path, load_and_resize, synthetic_image
from mafed_tpu.evaluation.vqa_metrics import normalize_answer


def format_text(text: str, strip: bool = True, capitalize: bool = True, punctuate: bool = True) -> str:
    """Question/answer surface formatting (vl_pythia_vqa_dataset.py:107-125)."""
    if strip:
        text = text.strip()
    if capitalize:
        text = text.capitalize()
    if punctuate and not text.endswith((".", "?", "!")):
        text = f"{text}."
    return text


class VQADataset:
    """Map-style VQA dataset over one task's annotations."""

    vision_table = None  # class default: partially-built instances stay safe

    def __init__(
        self,
        tokenizer,
        vision_cfg: VisionConfig,
        image_dirs: Sequence[str],
        data_path: str,
        split_file: str,
        task: str,
        split: str,
        max_txt_len: int = 60,
        synthetic_images: bool = False,
        vision_cache=None,
    ) -> None:
        self.tokenizer = tokenizer
        self.vision_cfg = vision_cfg
        self.image_dirs = list(image_dirs)
        self.split = split
        self.max_txt_len = max_txt_len
        self.synthetic_images = synthetic_images
        # data/vision_cache.py: frozen-tower features keyed by image; when a
        # key is cached the item ships "patches" instead of "pixels" and the
        # training/eval step skips the vision tower entirely
        self.vision_cache = vision_cache
        # data/vision_table.py: when the trainer attaches a device table for
        # this task, items ship a 4-byte "patch_idx" row index instead of the
        # ~0.5MB feature block; the runner gathers rows on device
        self.vision_table = None
        self._resolved: Dict[str, str] = {}  # img_fname -> abs path (cache keys)
        self.store = AnnotationStore(data_path=data_path, split=split, split_file=split_file, task=task)

    def __len__(self) -> int:
        return len(self.store)

    def image_key(self, index: int) -> str:
        """Stable identity of an example's image (vision-cache key).

        Synthetic images are generated from the example index, so the key is
        the index; real images key on the RESOLVED path (several questions
        share one image — the cache dedupes them). The bare filename is not
        enough: per-task/per-split image_dirs may contain same-named files
        with different content, and a filename key would silently serve one
        task's features for the other's image."""
        if self.synthetic_images:
            return f"synthetic:{index}"
        fname = self.store[index]["img_fname"]
        path = self._resolved.get(fname)
        if path is None:
            path = fname  # unresolvable now; __getitem__'s load will raise
            for d in self.image_dirs:
                p = get_image_path(d, fname)
                if os.path.exists(p):
                    path = os.path.abspath(p)
                    break
            self._resolved[fname] = path
        return f"img:{path}"

    def question_id(self, index: int):
        """Example identity WITHOUT image decode / feature load — annotation
        metadata only. Used by cache-membership scans (teacher_cache.py) that
        would otherwise pay a full __getitem__ per example just for the id."""
        return self.store[index].get("question_id")

    def load_pixels(self, index: int) -> np.ndarray:
        """Raw preprocessed uint8 pixels, bypassing the vision cache (used by
        the cache priming pass)."""
        return self._load_pixels(self.store[index]["img_fname"], index)

    def _load_pixels(self, img_fname: str, index: int) -> np.ndarray:
        if self.synthetic_images:
            return synthetic_image(index, self.vision_cfg)
        last_err: Optional[Exception] = None
        for d in self.image_dirs:
            path = get_image_path(d, img_fname)
            if os.path.exists(path):
                return load_and_resize(path, self.vision_cfg)
        raise FileNotFoundError(f"image {img_fname} not found under {self.image_dirs}")

    def __getitem__(self, index: int) -> Dict:
        ex = self.store[index]
        patch_idx = None
        if self.vision_table is not None:
            patch_idx = self.vision_table.index(self.image_key(index))
            if patch_idx is None:
                # attachment is all-or-nothing per task (continual.py builds
                # the table over every image this task's batches can draw);
                # falling back to streamed patches here would produce a mixed
                # batch that the fused window's tree.map(stack) cannot take
                raise KeyError(
                    f"image {self.image_key(index)!r} missing from the "
                    "attached vision table"
                )
        # single key resolve + single filesystem round-trip on the hot path
        patches = (
            self.vision_cache.load(self.image_key(index))
            if self.vision_cache is not None and patch_idx is None
            else None
        )
        pixels = (
            None
            if patches is not None or patch_idx is not None
            else self._load_pixels(ex["img_fname"], index)
        )
        question = format_text(ex["question"])
        answers = [normalize_answer(a["answer"]) for a in ex.get("answers", [])]
        answer = format_text(normalize_answer(ex.get("multiple_choice_answer", "")), capitalize=False)

        q_ids = list(self.tokenizer(question).input_ids)[: self.max_txt_len]
        item: Dict = {
            "answers": answers,
            "question_id": ex.get("question_id"),
            "raw": {"question": question, "answer": answer},
        }
        if patch_idx is not None:
            item["patch_idx"] = np.int32(patch_idx)
        elif patches is not None:
            item["patches"] = patches
        else:
            item["pixels"] = pixels
        if self.split == "train":
            a_ids = list(self.tokenizer(answer).input_ids)
            a_ids.append(self.tokenizer.eos_token_id)
            item["input_ids"] = np.asarray(q_ids + a_ids, np.int32)
            item["labels"] = np.asarray([IGNORE_INDEX] * len(q_ids) + a_ids, np.int32)
        else:
            item["input_ids"] = np.asarray(q_ids, np.int32)
            item["labels"] = None
        return item


class ConcatDataset:
    """Concatenation of map-style datasets (memory buffers across tasks)."""

    def __init__(self, datasets: Sequence) -> None:
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, index: int):
        ds_idx = int(np.searchsorted(self._offsets, index, side="right") - 1)
        return self.datasets[ds_idx][index - int(self._offsets[ds_idx])]

    def question_id(self, index: int):
        ds_idx = int(np.searchsorted(self._offsets, index, side="right") - 1)
        return question_id_of(self.datasets[ds_idx], index - int(self._offsets[ds_idx]))


class Subset:
    def __init__(self, dataset, indices: Sequence[int]) -> None:
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[self.indices[i]]

    def question_id(self, i: int):
        return question_id_of(self.dataset, self.indices[i])


def question_id_of(dataset, index: int):
    """Cheap example identity: the metadata-only accessor when the dataset
    provides one, else a full __getitem__ (synthetic/test datasets)."""
    fn = getattr(dataset, "question_id", None)
    if fn is not None:
        return fn(index)
    return dataset[index].get("question_id")
