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
