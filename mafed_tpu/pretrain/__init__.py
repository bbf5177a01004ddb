from mafed_tpu.pretrain.dataset import CaptionRecord, PretrainDataset, collate_pretrain
from mafed_tpu.pretrain.trainer import PretrainConfig, PretrainTrainer

__all__ = ["CaptionRecord", "PretrainDataset", "collate_pretrain", "PretrainConfig", "PretrainTrainer"]
