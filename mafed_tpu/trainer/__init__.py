from mafed_tpu.trainer.runner import TaskRunner
from mafed_tpu.trainer.continual import ContinualLearningTrainer

__all__ = ["TaskRunner", "ContinualLearningTrainer"]
