from streamyolo_tpu.utils.logger import get_logger, setup_logger
from streamyolo_tpu.utils.torch_import import (
    load_torch_checkpoint,
    merge_variables,
    state_dict_to_variables,
)

__all__ = [
    "get_logger",
    "setup_logger",
    "load_torch_checkpoint",
    "merge_variables",
    "state_dict_to_variables",
]
