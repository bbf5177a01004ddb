"""Continual-learning strategies.

Registry parity: mafed/methods/__init__.py:6-11 — naive / ewc / replay /
featdistill, constructed with the same kwargs surface
(train.py:116-135).
"""

from mafed_tpu.cl.base import CLStrategy, Naive
from mafed_tpu.cl.ewc import EWC
from mafed_tpu.cl.replay import ER
from mafed_tpu.cl.distillation import FeatureDistillation

CLMethod = {
    "naive": Naive,
    "ewc": EWC,
    "replay": ER,
    "featdistill": FeatureDistillation,
}

__all__ = ["CLStrategy", "Naive", "EWC", "ER", "FeatureDistillation", "CLMethod"]
