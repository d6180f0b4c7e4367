"""StreamYOLO-TPU: a TPU-native streaming-perception framework in JAX.

A from-scratch rebuild of the capabilities of yancie-yjr/StreamYOLO
(CVPR 2022 "Real-time Object Detection for Streaming Perception"),
designed TPU-first: NHWC layouts, XLA-fused conv-BN-SiLU, fixed-shape
vectorized SimOTA label assignment, jittable batched NMS, and the DFP
temporal feature buffer carried as a jit-resident pytree.
"""

from streamyolo_tpu.version import __version__

__all__ = ["__version__"]
