from mafed_tpu.core.config import (
    ModelConfig,
    TrainConfig,
    VisionConfig,
    build_arg_parser,
    parse_with_config,
)
from mafed_tpu.core.logging import LOGGER, MetricsLogger, add_log_to_file

__all__ = [
    "ModelConfig",
    "TrainConfig",
    "VisionConfig",
    "build_arg_parser",
    "parse_with_config",
    "LOGGER",
    "MetricsLogger",
    "add_log_to_file",
]
