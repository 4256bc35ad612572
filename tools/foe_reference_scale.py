"""FoE-error validation at the reference's own scale and protocol.

BASELINE.md's headline accuracy rows are FoE estimation errors on AirSim
straight-flight sequences at 1920x1024 (reference `get_figures.py:163-172`:
"center" mean (2.81, -7.18) px, std (4.9, 6.4) px, with the validator's
outlier protocol — >50 px rejected, frames >= 56 only,
`validator.py:171-192`). This tool produces the directly comparable number
from our own closed loop: mock-sim straight flight at 1920x1024 -> states
with view-projection matrices -> GT flow from matrices+depth
(`data/airsim_flow`) -> full FoE detection branch -> validator FoE stats.

Run (TPU recommended for the detection step):
    python tools/foe_reference_scale.py --frames 90 --hw 1024x1920
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Collision mode with a small crossing angle: the observer flies a straight
# track (captures are unconditional in this mode, control.py capture
# heuristics), so the camera expands about a steady FoE like the
# reference's straight-flight sequences; LINE mode's visibility heuristic
# cannot trigger hermetically (the crossing target leaves frame instantly
# at the grid's orbit speeds).
# Both drones start on a radius-R circle and fly toward its center at
# global_speed (closing speed ~2x), so the sequence length is
# ~2R/(2*speed) steps: R=70 at 1.0 m/s gives ~70 captures — enough for the
# reference protocol's frames>=56 rule to engage.
COLLECTION = {
    "orientations": ["north"],
    "locations": {"fieldline": {"x": 0.0, "y": 0.0, "z": -2.0}},
    "orbit_speed": [2.0],
    "global_speed": {"default": {"lin_x": 1.0, "sin_y": 0.0, "sin_z": 0.0}},
    "heights": {"low": 4.0},
    "radii": [70.0],
    "modes": ["collision"],
    "collision_angles": [5.0],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=90)
    ap.add_argument("--hw", default="1024x1920",
                    help="capture resolution HxW (reference: 1024x1920)")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--keep", default="",
                    help="keep the collected dataset at this path")
    ap.add_argument("--foe-samples", type=int, default=1000,
                    help="dense-FoE sampling budget (reference N=1000)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the JAX_PLATFORMS env var "
                         "loses to the axon plugin; per-op dispatch over the "
                         "tunnel makes host-side loops crawl)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    log = logging.getLogger("foe-ref")
    h, w = (int(x) for x in args.hw.split("x"))

    from mav_detection_tpu.sim.client import MockSimClient
    from mav_detection_tpu.sim.control import SimDataCollector

    root = args.keep or tempfile.mkdtemp(prefix="foe_ref_")
    client = MockSimClient(image_hw=(h, w), fov_deg=90)
    collector = SimDataCollector(client, COLLECTION, root_data_dir=root,
                                 max_iterations=args.frames)
    log.info(f"collecting {args.frames} frames at {w}x{h} ...")
    collector.run()
    seq = os.path.relpath(collector.get_base_dir(collector.configs[0]), root)
    os.environ["SIMDATA_PATH"] = root

    from mav_detection_tpu.core.config import FlowSource, RunConfig
    from mav_detection_tpu.data.sim_data import SimDataset
    from mav_detection_tpu.eval.validator import Validator
    from mav_detection_tpu.pipeline.processor import Processor

    ds = SimDataset(sequence=seq)
    log.info(f"dataset: {ds.N} frames; GT flow synthesized from matrices")

    cfg = RunConfig(dataset="simulation", sequence=seq,
                    mode="FLOW_FOE_CLUSTERING",
                    flow_source=FlowSource.GROUND_TRUTH,
                    batch_size=args.batch, headless=True,
                    foe_samples=args.foe_samples)
    proc = Processor(cfg)
    proc.run_detection()

    v = Validator(cfg)
    v.dataset = cfg.get_dataset()
    v.load_results()
    stats = v.compute_foe_stats()
    n_scoring = len(v.foe_error)  # after the frames>=56 protocol cut
    log.info("ours:      mean (%.2f, %.2f) px, std (%.1f, %.1f) px "
             "over %d scoring frames (of %d) at %dx%d"
             % (stats["foe_mean"][0], stats["foe_mean"][1],
                stats["foe_std"][0], stats["foe_std"][1],
                n_scoring, ds.N - 1, w, h))
    log.info("reference: mean (2.81, -7.18) px, std (4.9, 6.4) px "
             "(straight flight 'center', get_figures.py:163-172)")
    print(json.dumps({
        "ours_mean": [round(float(x), 3) for x in stats["foe_mean"]],
        "ours_std": [round(float(x), 3) for x in stats["foe_std"]],
        "reference_mean": [2.81, -7.18],
        "reference_std": [4.9, 6.4],
        "resolution": f"{w}x{h}", "frames": ds.N,
    }))


if __name__ == "__main__":
    main()
