from mafed_tpu.data.annotations import AnnotationStore, load_task_ids
from mafed_tpu.data.collate import collate_train, collate_val
from mafed_tpu.data.loader import BatchLoader
from mafed_tpu.data.prefetch import DevicePrefetcher
from mafed_tpu.data.tokenizer import build_tokenizer
from mafed_tpu.data.vqa_dataset import VQADataset, format_text

__all__ = [
    "AnnotationStore",
    "load_task_ids",
    "collate_train",
    "collate_val",
    "BatchLoader",
    "DevicePrefetcher",
    "build_tokenizer",
    "VQADataset",
    "format_text",
]
