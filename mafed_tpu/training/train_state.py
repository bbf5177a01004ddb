"""Training state: trainable/frozen split + optimizer state.

The vision encoder is frozen in every reference config
(vqa_cont_learner.py:201-203), so it is kept OUT of the differentiated
pytree — no grads, no Adam moments, and it can live in bf16. This halves
optimizer memory vs naively masking.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple


class TrainState(NamedTuple):
    step: Any
    trainable: Dict[str, Any]  # decoder + projector params
    frozen: Dict[str, Any]  # vision params
    opt_state: Any


def split_params(params: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    trainable = {k: v for k, v in params.items() if k != "vision"}
    frozen = {"vision": params["vision"]}
    return trainable, frozen


def merge_params(trainable: Dict[str, Any], frozen: Dict[str, Any]) -> Dict[str, Any]:
    return {**trainable, **frozen}
