"""Captioning pretrain dataset.

Parity with mafed/data/vl_pythia_pretrain_dataset.py: image-caption pairs
from cc3m / coco-captions / visual-genome / sbu; VG regions are
object-center-cropped before preprocessing (:72-83); captions formatted
strip/capitalize/fullstop; labels = input_ids (full supervision, the model
shifts); attention all ones. Sources:

  * an HF dataset (when `datasets` + the data are available), or
  * a JSONL manifest: {"image": path, "caption": str, "source": str,
    "metadata": {...}} per line — the zero-dependency path for TPU pods.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from mafed_tpu.core.config import VisionConfig
from mafed_tpu.data.images import load_and_resize, synthetic_image
from mafed_tpu.data.vqa_dataset import format_text
from mafed_tpu.utils.boxes import ObjectCenterCrop


@dataclass
class CaptionRecord:
    image: str  # path (manifest mode) or source-specific key
    caption: str
    source: str = "coco"
    metadata: Dict = field(default_factory=dict)


class PretrainDataset:
    """Map-style caption dataset over a JSONL manifest or HF dataset."""

    def __init__(
        self,
        tokenizer,
        vision_cfg: VisionConfig,
        manifest_path: Optional[str] = None,
        records: Optional[Sequence[CaptionRecord]] = None,
        hf_dataset=None,
        model_max_length: int = 100,
        synthetic_images: bool = False,
    ) -> None:
        self.tokenizer = tokenizer
        self.vision_cfg = vision_cfg
        self.model_max_length = model_max_length
        self.synthetic_images = synthetic_images
        self._hf_dataset = hf_dataset
        self._center_crop = ObjectCenterCrop((vision_cfg.img_size, vision_cfg.img_size))

        if records is not None:
            self.records = list(records)
        elif manifest_path is not None:
            self.records = []
            with open(manifest_path) as f:
                for line in f:
                    if line.strip():
                        self.records.append(CaptionRecord(**json.loads(line)))
        elif hf_dataset is not None:
            self.records = None  # lazy via hf_dataset
        else:
            raise ValueError("need records, manifest_path, or hf_dataset")

    def __len__(self) -> int:
        return len(self._hf_dataset) if self.records is None else len(self.records)

    def _pixels(self, rec: CaptionRecord, index: int) -> np.ndarray:
        if self.synthetic_images:
            return synthetic_image(index, self.vision_cfg)
        from PIL import Image

        img = Image.open(rec.image).convert("RGB")
        if rec.source == "visual_genome" and "bbox" in rec.metadata:
            img = self._center_crop(img, rec.metadata["bbox"])
            # re-encode through the standard resize path for static shapes
            img = img.resize((self.vision_cfg.img_size, self.vision_cfg.img_size))
            return np.asarray(img, np.uint8)
        tmp = rec.image
        return load_and_resize(tmp, self.vision_cfg)

    def __getitem__(self, index: int) -> Dict:
        if self.records is None:
            raw = self._hf_dataset[index]
            rec = CaptionRecord(
                image=raw.get("image", ""),
                caption=raw["caption"],
                source=raw.get("source", "coco"),
                metadata=json.loads(raw["metadata"]) if isinstance(raw.get("metadata"), str) else raw.get("metadata", {}),
            )
        else:
            rec = self.records[index]
        caption = format_text(rec.caption)
        ids = list(self.tokenizer(caption).input_ids)[: self.model_max_length]
        arr = np.asarray(ids, np.int32)
        return {
            "pixels": self._pixels(rec, index),
            "input_ids": arr,
            "labels": arr.copy(),  # model shifts; full-caption supervision
            "raw": {"caption": caption, "metadata": rec.metadata},
        }


def collate_pretrain(items: List[Dict], text_len: int, pad_token_id: int = 0, padding_side: str = "right") -> Dict[str, np.ndarray]:
    """Collate with the reference's padding policy (utils/vl_pythia.py:195-254):
    input_ids padded with pad_token_id, labels with -100, attention 0;
    right padding by default for pretraining."""
    from mafed_tpu.constants import IGNORE_INDEX

    n = len(items)
    input_ids = np.full((n, text_len), pad_token_id, np.int32)
    labels = np.full((n, text_len), IGNORE_INDEX, np.int32)
    attention = np.zeros((n, text_len), np.int32)
    for i, it in enumerate(items):
        ids = it["input_ids"][:text_len]
        lbl = it["labels"][:text_len]
        if padding_side == "right":
            input_ids[i, : len(ids)] = ids
            labels[i, : len(lbl)] = lbl
            attention[i, : len(ids)] = 1
        else:
            input_ids[i, text_len - len(ids):] = ids
            labels[i, text_len - len(lbl):] = lbl
            attention[i, text_len - len(ids):] = 1
    return {
        "input_ids": input_ids,
        "labels": labels,
        "attention_mask": attention,
        "pixels": np.stack([it["pixels"] for it in items]),
    }
