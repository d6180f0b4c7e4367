from streamyolo_tpu.stream.clock import SimClock, WallClock
from streamyolo_tpu.stream.online import (
    MultiStreamDetector,
    SimulatedDetector,
    TPUStreamDetector,
    export_multi_stream_executables,
    export_stream_executables,
    print_stats,
    run_streaming_detection,
    stream_sequence,
    stream_sequence_infinite,
)
from streamyolo_tpu.stream.pairing import (
    detections_for_image,
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
    "MultiStreamDetector",
    "SimulatedDetector",
    "TPUStreamDetector",
    "print_stats",
    "run_streaming_detection",
    "stream_sequence",
    "stream_sequence_infinite",
    "detections_for_image",
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
from streamyolo_tpu.stream.forecast import (
    KFForecaster,
    Streamer,
    bbox_extrap_lin,
    bbox_extrap_quad,
    extrap_clean_up,
)
from streamyolo_tpu.stream.track import (
    iou_assoc,
    iou_assoc_no_tracks,
    iou_ltwh,
    track_based_shuffle,
)

__all__ += [
    "KFForecaster",
    "Streamer",
    "bbox_extrap_lin",
    "bbox_extrap_quad",
    "extrap_clean_up",
    "iou_assoc",
    "iou_assoc_no_tracks",
    "iou_ltwh",
    "track_based_shuffle",
]
