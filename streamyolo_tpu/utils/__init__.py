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
from streamyolo_tpu.utils.aot import aot_compile, enable_compilation_cache, time_synchronized
from streamyolo_tpu.utils.checkpoint import load_checkpoint, load_ckpt_tolerant, save_checkpoint
from streamyolo_tpu.utils.fuse import fuse_model_variables
from streamyolo_tpu.utils.meters import AverageMeter, MeterBuffer, device_mem_usage_mb
from streamyolo_tpu.utils.model_info import count_params, get_model_info
from streamyolo_tpu.utils.wandb_logger import WandbLogger
