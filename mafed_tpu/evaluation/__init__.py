from mafed_tpu.evaluation.decode import make_greedy_decoder
from mafed_tpu.evaluation.validate import validate_vqa
from mafed_tpu.evaluation.vqa_metrics import (
    VQAGenerativeAccuracy,
    normalize_answer,
    vqa_v2_score,
)

__all__ = [
    "make_greedy_decoder",
    "validate_vqa",
    "VQAGenerativeAccuracy",
    "normalize_answer",
    "vqa_v2_score",
]
