from mafed_tpu.optim.optimizer import build_optimizer, param_group_masks
from mafed_tpu.optim.sched import linear_warmup_schedule, warmup_linear_lr

__all__ = ["build_optimizer", "param_group_masks", "linear_warmup_schedule", "warmup_linear_lr"]
