"""Hardware validation of the Pallas Farneback wide-frame (column-tiled) path.

ADVICE r2 flagged that the W>1024 tiling was only exercised in interpret
mode; this script runs the tuned product configuration on REAL TPU at the
AirSim reference resolution (1920x1024, ``/root/reference/etc/settings.json:17-19``)
and at the bench resolution, asserting accuracy on a known-shift pair.

Run: python tools/wide_frame_check.py   (requires a TPU backend)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def check(h: int, w: int, shift=(2, 3)) -> float:
    from scipy.ndimage import gaussian_filter

    from mav_detection_tpu.ops.flow import FarnebackParams, farneback_flow

    rng = np.random.default_rng(0)
    pad = 16
    tex = gaussian_filter(rng.random((h + 2 * pad, w + 2 * pad)).astype(np.float32), 2.0)
    tex = (tex - tex.min()) / np.ptp(tex) * 255
    prev = tex[pad:pad + h, pad:pad + w]
    curr = tex[pad - shift[1]:pad + h - shift[1], pad - shift[0]:pad + w - shift[0]]

    params = FarnebackParams(warp="pallas", levels=2, pyr_scale=0.5,
                             iterations=6, max_shift=8, band_rows=24)
    t0 = time.time()
    flow = np.asarray(farneback_flow(jnp.asarray(prev), jnp.asarray(curr), params))
    compile_s = time.time() - t0
    interior = flow[32:-32, 32:-32]
    epe = float(np.linalg.norm(interior - np.asarray(shift, np.float32),
                               axis=-1).mean())
    t0 = time.time()
    for _ in range(5):
        out = farneback_flow(jnp.asarray(prev), jnp.asarray(curr), params)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / 5 * 1e3
    print(f"{w}x{h}: EPE {epe:.4f} px (gate < 0.1), {ms:.2f} ms/frame, "
          f"compile {compile_s:.1f}s")
    assert epe < 0.1, f"{w}x{h}: EPE {epe} >= 0.1"
    return ms


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    check(480, 752)
    check(1024, 1920)
    print("wide-frame Pallas path OK on", jax.default_backend())
