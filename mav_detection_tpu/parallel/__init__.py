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
