"""Cross-domain (out-of-family) evaluation of the learned models.

Round-2 verdict #2: every model gate was scored on the ``data/synthetic``
fixture family — held-out seeds of the SAME procedural family the models
train on. This harness evaluates RAFT, the sky net, TinyYOLO, LK dense flow,
and Farneback on two genuinely different renderers that both carry exact GT:

* the ``bench.py`` cv2-rendered scene family (blurred-noise texture, radial
  expansion + rotation field, analytic GT flow), and
* mock-simulator captures (ray-cast ground plane + sky, GT flow synthesized
  from view-projection matrices + depth by ``data.airsim_flow`` — the
  reference's own GT pipeline, ``airsim_optical_flow.py:87-149``).

Run: python tools/cross_domain_eval.py [--hw 240x320] [--seeds 3] [--cpu]
Numbers land in PERF.md "Cross-domain evaluation".
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_scene_metrics(h: int, w: int, seeds, iters: int = 0,
                        raft_params=None):
    """Flow EPE (overall + drone region), sky TPR/FPR, YOLO IoU on the
    cv2-rendered bench family. ``raft_params`` overrides the shipped RAFT
    checkpoint (pass it when scoring a fine-tune candidate)."""
    import numpy as np

    import jax.numpy as jnp

    import bench
    from mav_detection_tpu.core.rectangle import Rectangle
    from mav_detection_tpu.models import pretrained
    from mav_detection_tpu.models.raft import raft_flow
    from mav_detection_tpu.models.sky_segmentation import sky_mask
    from mav_detection_tpu.models.yolo import detect_boxes
    from mav_detection_tpu.ops.flow import FarnebackParams, farneback_flow
    from mav_detection_tpu.ops.flow.lucas_kanade import lk_dense_flow

    raft_p = (raft_params if raft_params is not None
              else pretrained.load_raft_params())
    sky_p = pretrained.load_sky_params()
    yolo_p = pretrained.load_yolo_params()
    scale = min(h / bench.H, w / bench.W)
    out = {k: [] for k in ("raft_epe", "raft_drone_epe", "fb_epe", "lk_epe",
                           "sky_tpr", "sky_fpr", "yolo_iou")}
    for seed in seeds:
        foe = (bench.FOE[0] * w / bench.W, bench.FOE[1] * h / bench.H)
        pos = (170.0 * w / bench.W, 120.0 * h / bench.H)
        prev8, curr8, gt = bench.make_scene(
            seed, h=h, w=w, foe=foe, expansion=bench.EXPANSION,
            drone_pos=pos, drone_vel=(4.0 * scale, 2.5 * scale),
            drone_radius=max(10.0 * scale, 4.0))
        interior = np.zeros((h, w), bool)
        interior[16:-16, 16:-16] = True
        drone = ((np.arange(w)[None, :] - pos[0]) ** 2
                 + (np.arange(h)[:, None] - pos[1]) ** 2
                 <= max(10.0 * scale, 4.0) ** 2)

        def epe(flow, mask):
            return float(np.linalg.norm(np.asarray(flow) - gt, axis=-1)[mask].mean())

        if raft_p is not None:
            fl = raft_flow(raft_p, jnp.asarray(prev8), jnp.asarray(curr8),
                           iters=iters)
            out["raft_epe"].append(epe(fl, interior))
            out["raft_drone_epe"].append(epe(fl, drone))
        fb = farneback_flow(jnp.asarray(prev8, jnp.float32),
                            jnp.asarray(curr8, jnp.float32),
                            FarnebackParams(warp="auto", fast=True, levels=2,
                                            pyr_scale=0.5))
        out["fb_epe"].append(epe(fb, interior))
        lk = lk_dense_flow(jnp.asarray(prev8, jnp.float32),
                           jnp.asarray(curr8, jnp.float32))
        out["lk_epe"].append(epe(lk, interior))

        sky_gt = np.zeros((h, w), bool)
        sky_gt[: int(0.35 * h)] = True
        if sky_p is not None:
            frame = np.repeat(prev8[..., None], 3, -1)
            est = np.asarray(sky_mask(sky_p, jnp.asarray(frame)))
            out["sky_tpr"].append(float((est & sky_gt).sum() / sky_gt.sum()))
            out["sky_fpr"].append(float((est & ~sky_gt).sum() / (~sky_gt).sum()))
        if yolo_p is not None:
            frame = np.repeat(prev8[..., None], 3, -1)
            boxes = detect_boxes(yolo_p, jnp.asarray(frame))
            r = max(10.0 * scale, 4.0)
            gt_rect = Rectangle((pos[0] - r, pos[1] - r), (2 * r, 2 * r))
            best = 0.0
            valid = np.asarray(boxes.valid)
            for j in range(len(valid)):
                if valid[j]:
                    x, y, bw, bh = np.asarray(boxes.xywh[j])
                    best = max(best, Rectangle.calculate_iou_safe(
                        Rectangle((x - bw / 2, y - bh / 2), (bw, bh)), gt_rect))
            out["yolo_iou"].append(best)
    return {k: (float(sum(v) / len(v)) if v else None) for k, v in out.items()}


def mock_sim_metrics(h: int = 96, w: int = 128, iters: int = 0,
                     raft_params=None):
    """Flow EPE vs matrices+depth GT on mock-simulator captures; YOLO IoU vs
    the segmentation bbox; sky TPR/FPR vs the far-depth band.

    ``raft_params`` overrides the shipped RAFT checkpoint — candidate
    evaluation MUST pass it (a fine-tune gate that lets this default to the
    shipped weights compares shipped to shipped and always passes)."""
    import numpy as np

    import jax.numpy as jnp

    from mav_detection_tpu.core.rectangle import Rectangle
    from mav_detection_tpu.data.airsim_flow import calculate_flow, parse_view_proj
    from mav_detection_tpu.models import pretrained
    from mav_detection_tpu.models.raft import raft_flow
    from mav_detection_tpu.models.sky_segmentation import sky_mask
    from mav_detection_tpu.models.yolo import detect_boxes
    from mav_detection_tpu.ops.flow import FarnebackParams, farneback_flow
    from mav_detection_tpu.ops.image.boxes import get_simple_bounding_box
    from mav_detection_tpu.sim.client import MockSimClient, Vector3

    c = MockSimClient(image_hw=(h, w), fov_deg=100, target_radius_m=0.7)
    c.set_pose("Drone1", Vector3(0.0, 0.0, -6.0), 0.05)
    c.set_pose("Drone2", Vector3(7.0, 1.0, -5.5), 0.0)
    for d in c.drones.values():
        d.landed = False
    c.drones["Drone1"].velocity = np.array([2.0, 0.3, 0.0])
    c.drones["Drone2"].velocity = np.array([-1.2, 0.8, 0.0])

    raft_p = (raft_params if raft_params is not None
              else pretrained.load_raft_params())
    sky_p = pretrained.load_sky_params()
    yolo_p = pretrained.load_yolo_params()
    out = {k: [] for k in ("raft_epe", "raft_drone_epe", "fb_epe",
                           "sky_tpr", "sky_fpr", "yolo_iou")}
    dt = 0.12
    n_pairs = 6
    frames, states = [], []
    for _ in range(n_pairs + 1):
        resp = {r.image_type: r for r in c.capture("Drone1")}
        frames.append(resp)
        states.append({v: c.get_state(v) for v in ("Drone1", "Drone2")})
        c.continue_for_time(dt)

    for i in range(n_pairs):
        r1, r2 = frames[i], frames[i + 1]
        s1, s2 = states[i], states[i + 1]
        vp1, vp2 = parse_view_proj(s1), parse_view_proj(s2)
        depth_cm = r1["depth"].data * 100.0
        seg1 = r1["segmentation"].data[..., 0]
        vel = s1["Drone2"]["ue4"]["linearVelocity"]
        disp = np.array([vel["X"], vel["Y"], vel["Z"]]) * dt * 100.0
        gt = np.asarray(calculate_flow(
            jnp.asarray(vp1, jnp.float32), jnp.asarray(vp2, jnp.float32),
            (w, h), jnp.asarray(depth_cm, jnp.float32),
            jnp.asarray(disp, jnp.float32), jnp.asarray(seg1)))
        interior = np.zeros((h, w), bool)
        interior[6:-6, 6:-6] = True
        # the sky/ground horizon is a true depth discontinuity — every flow
        # method smooths across it; exclude a 2-row band like bench's border
        ddepth = np.abs(np.diff(r1["depth"].data, axis=0, prepend=r1["depth"].data[:1]))
        horizon = ddepth > 500.0
        for _ in range(2):
            horizon[1:] |= horizon[:-1]
            horizon[:-1] |= horizon[1:]
        interior &= ~horizon
        drone = seg1 > 0
        f1 = r1["scene"].data
        f2 = r2["scene"].data

        def epe(flow, mask):
            return float(np.linalg.norm(np.asarray(flow) - gt, axis=-1)[mask].mean())

        if raft_p is not None:
            fl = raft_flow(raft_p, jnp.asarray(f1), jnp.asarray(f2), iters=iters)
            out["raft_epe"].append(epe(fl, interior))
            if drone.any():
                out["raft_drone_epe"].append(epe(fl, drone))
        fb = farneback_flow(jnp.asarray(f1[..., 0], jnp.float32),
                            jnp.asarray(f2[..., 0], jnp.float32),
                            FarnebackParams(warp="auto", fast=True, levels=2,
                                            pyr_scale=0.5))
        out["fb_epe"].append(epe(fb, interior))
        if sky_p is not None:
            sky_gt = r1["depth"].data >= 9000.0
            est = np.asarray(sky_mask(sky_p, jnp.asarray(f1)))
            out["sky_tpr"].append(float((est & sky_gt).sum() / max(sky_gt.sum(), 1)))
            out["sky_fpr"].append(float((est & ~sky_gt).sum() / max((~sky_gt).sum(), 1)))
        if yolo_p is not None and drone.any():
            gt_rect = get_simple_bounding_box(r1["segmentation"].data)
            boxes = detect_boxes(yolo_p, jnp.asarray(f1))
            best = 0.0
            valid = np.asarray(boxes.valid)
            for j in range(len(valid)):
                if valid[j]:
                    x, y, bw, bh = np.asarray(boxes.xywh[j])
                    best = max(best, Rectangle.calculate_iou_safe(
                        Rectangle((x - bw / 2, y - bh / 2), (bw, bh)), gt_rect))
            out["yolo_iou"].append(best)
    return {k: (float(sum(v) / len(v)) if v else None) for k, v in out.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="240x320")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=0)  # 0 = product default
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    h, w = (int(x) for x in args.hw.split("x"))

    t0 = time.time()
    bench_m = bench_scene_metrics(h, w, range(1, 1 + args.seeds),
                                  iters=args.iters)
    print(f"bench-family ({w}x{h}, {args.seeds} seeds): "
          + json.dumps({k: (round(v, 4) if v is not None else None)
                        for k, v in bench_m.items()}))
    sim_m = mock_sim_metrics(iters=args.iters)
    print("mock-sim (128x96, 6 pairs): "
          + json.dumps({k: (round(v, 4) if v is not None else None)
                        for k, v in sim_m.items()}))
    print(f"({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
