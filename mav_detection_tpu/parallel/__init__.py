from mav_detection_tpu.parallel.mesh import (
    make_mesh,
    shard_frame_batch,
    detect_frames_sharded,
    aggregate_metrics_psum,
)

__all__ = [
    "make_mesh",
    "shard_frame_batch",
    "detect_frames_sharded",
    "aggregate_metrics_psum",
]

from mav_detection_tpu.parallel.spatial import farneback_flow_spatial  # noqa: E402

__all__.append("farneback_flow_spatial")
