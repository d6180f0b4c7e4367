from streamyolo_tpu.stream.clock import SimClock, WallClock
from streamyolo_tpu.stream.online import (
    SimulatedDetector,
    TPUStreamDetector,
    print_stats,
    run_streaming_detection,
    stream_sequence,
)
from streamyolo_tpu.stream.pairing import (
    eval_ccf,
    ltrb2ltwh,
    pair_streaming_results,
    streaming_eval,
)
from streamyolo_tpu.stream.runtime_dist import (
    Empirical,
    add_to_runtime_zoo,
    dist_from_dict,
    dist_from_zoo,
)
from streamyolo_tpu.stream.schedule_sim import POLICIES, sim

__all__ = [
    "SimClock",
    "WallClock",
    "SimulatedDetector",
    "TPUStreamDetector",
    "print_stats",
    "run_streaming_detection",
    "stream_sequence",
    "eval_ccf",
    "ltrb2ltwh",
    "pair_streaming_results",
    "streaming_eval",
    "Empirical",
    "add_to_runtime_zoo",
    "dist_from_dict",
    "dist_from_zoo",
    "POLICIES",
    "sim",
]
