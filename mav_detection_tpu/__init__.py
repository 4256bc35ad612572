"""TPU-native MAV detection framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
pipeline (evroon/mav-detection): dense optical flow, ego-motion estimation and
removal, Focus-of-Expansion voting, flow-angle segmentation, and neural flow /
detector inference — all batched, jitted, and shardable over TPU meshes.

Layering (bottom-up):
  core/      pure math + IO + typed config (no jit requirements)
  ops/       device compute: flow kernels, geometry, image ops
  models/    neural nets (RAFT-style flow, sky segmentation, YOLO-style head)
  parallel/  mesh construction, sharding, collectives
  pipeline/  the frame engine (replaces the reference's Processor loop)
  data/      dataset contracts (MIDGARD / AirSim sim / VisDrone / experiment)
  eval/      validator: metric aggregation, ROC plots, npy artifacts
  cli/       main.py-compatible command line
  sim/       AirSim data-generation suite (host-only RPC choreography)
  runtime/   native (C++) host runtime: .flo codec + prefetching loader
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt out: MAV_TPU_NO_COMPILE_CACHE=1).

    Every CLI entry pays 20-40 s of first-compile per jitted program on TPU
    without this (the reference has no analogous cost — OpenCV ships
    precompiled C++). An explicit ``JAX_COMPILATION_CACHE_DIR`` from the
    user wins; only programs that took >=1 s to compile are persisted.
    """
    if _os.environ.get("MAV_TPU_NO_COMPILE_CACHE"):
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        cache = _os.path.join(_os.path.expanduser("~"), ".cache",
                              "mav_detection_tpu", "jax_cache")
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — the cache is an optimization only
        pass


_enable_compilation_cache()
