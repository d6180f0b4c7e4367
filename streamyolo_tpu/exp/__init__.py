from streamyolo_tpu.exp.base import BaseExp, get_exp
from streamyolo_tpu.exp.stream_exp import StreamExp

__all__ = ["BaseExp", "StreamExp", "get_exp"]
