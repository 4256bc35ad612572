"""Roofline accounting for the fused Farneback Pallas kernel (VERDICT r3 #2).

Counts, analytically from the kernel structure (``farneback_pallas._iter_math``),
the HBM bytes moved and the VPU f32 ops executed per solver iteration, then
times the kernel IN ISOLATION (amortized in-program repetitions) at batch 1
and 8 and reports what fraction of the v5e rooflines it achieves — and which
wall it stands against. This is the missing anchor for the bench headline:
"369 fps" means nothing without knowing what the hardware permits.

v5e peaks used (stated assumptions, overridable by flags):
  * HBM bandwidth 819 GB/s (public v5e spec).
  * VPU f32: an (8, 128) vector unit with 4 ALUs per lane at ~940 MHz
    ~= 3.85 Top/s. The kernel is select/fma VPU code — the MXU (197 bf16
    TFLOP/s) never engages, so the relevant compute roof is the VPU one.

Byte accounting (element halo, per frame per iteration):
  * 11 loop-invariant planes (5 slab + 5 r0 + 1 border) are RE-READ each
    iteration through (rs x cwp) element windows per (band, tile) block:
    Pallas streams the halo'd block even though th x tw of it is new.
  * 2 flow planes read through (rf x cwp) windows; 2 written exactly (th,tw).
  * stacked halo additionally restacks the flow in XLA each iteration
    (read H x W + write the banded copy) while the 11 static planes are
    stacked once per pyramid LEVEL (amortized over `iterations`).

FLOP accounting (per block, dominated by the two shift/select chains):
  * y-stage: (2S+2) steps x [~5 ops weight + 5 planes x 2 ops] on the
    (mrows x acols) A region.
  * x-stage: same on (mrows x mcols).
  * box blur: 5 planes x (taps adds on (th x mcols) + taps adds + 1 mul on
    (th x tw)).
  * coordinate setup ~20 ops on (mrows x tw+2P); normal entries ~25, edge
    replication ~14, solve ~12 on (mrows x mcols)/(th x tw).
Select/compare count as 1 op each (they occupy a VPU slot like an add).

Run on the chip: python tools/pallas_roofline.py [--hw 480x752] [--batches 1,8]
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

HBM_GBS = 819.0
VPU_TOPS = 3.85


def kernel_geometry(H: int, W: int, band_rows: int, max_shift: int,
                    winsize: int = 12, tile_cols: int = 0):
    """The kernel's effective tiling, via its own ``resolve_tiling`` (single
    source of truth since round 5 — this used to be a hand-kept mirror)."""
    from mav_detection_tpu.ops.flow.farneback_pallas import resolve_tiling

    S, m = max_shift, winsize // 2
    th, tw, nbands, nctiles, _ = resolve_tiling(
        H, W, band_rows=band_rows, max_shift=max_shift, winsize=winsize,
        tile_cols=tile_cols)
    return dict(S=S, m=m, P=S + 1 + m, th=th, tw=tw, nbands=nbands,
                nctiles=nctiles)


def bytes_per_iter(H: int, W: int, g: dict, halo: str) -> float:
    """HBM bytes per frame per solver iteration (f32 = 4 B)."""
    S, m, P, th, tw = g["S"], g["m"], g["P"], g["th"], g["tw"]
    nb, nt = g["nbands"], g["nctiles"]
    if halo == "element":
        rs = -(-(th + 2 * P) // 8) * 8
        rf = -(-(th + 2 * m) // 8) * 8
        cw = tw + 2 * P
        cwp = cw if nt == 1 else -(-cw // 128) * 128
        static_reads = nb * nt * 11 * rs * cwp          # slabs+r0+border
        flow_reads = nb * nt * 2 * rf * cwp
        out_writes = nb * nt * 2 * th * tw
        return 4.0 * (static_reads + flow_reads + out_writes)
    # stacked: kernel reads pre-banded copies; flow is restacked in XLA
    # every iteration (read exact + write banded), static planes amortize
    # over the level's iterations (counted by caller via static_per_level).
    band_elems = (th + 2 * P) * (tw + 2 * P)
    kernel_reads = nb * nt * (11 + 2) * band_elems
    out_writes = nb * nt * 2 * th * tw
    restack = 2 * H * W + nb * nt * 2 * band_elems      # read flow + write copy
    return 4.0 * (kernel_reads + out_writes + restack)


def flops_per_iter(H: int, W: int, g: dict) -> float:
    """VPU f32 ops per frame per solver iteration (selects count 1)."""
    S, m, P, th, tw = g["S"], g["m"], g["P"], g["th"], g["tw"]
    nb, nt = g["nbands"], g["nctiles"]
    mrows, mcols = th + 2 * m, tw + 2 * m
    acols = tw + 2 * m + 2 * S + 1
    taps = 2 * m + 1
    per_block = (
        20 * mrows * (tw + 2 * P)                        # coords/fractions
        + (2 * S + 2) * 15 * mrows * acols               # y shift/select
        + (2 * S + 2) * 15 * mrows * mcols               # x shift/select
        + 25 * mrows * mcols                             # normal entries
        + 14 * mrows * mcols                             # edge replication
        + 5 * (taps * th * mcols + (taps + 1) * th * tw)  # box blur
        + 12 * th * tw                                   # 2x2 solve
    )
    return float(nb * nt * per_block)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="480x752")
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--band-rows", type=int, default=24)
    ap.add_argument("--max-shift", type=int, default=8)
    ap.add_argument("--iterations", type=int, default=6)
    ap.add_argument("--halo", default="element,stacked")
    ap.add_argument("--hbm-gbs", type=float, default=HBM_GBS)
    ap.add_argument("--vpu-tops", type=float, default=VPU_TOPS)
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split("x"))

    from mav_detection_tpu.ops.flow.farneback import _border_scale_map, _poly_exp
    from mav_detection_tpu.ops.flow.farneback_pallas import farneback_iterate_pallas

    g = kernel_geometry(H, W, args.band_rows, args.max_shift)
    print(f"geometry {W}x{H}: th={g['th']} tw={g['tw']} "
          f"bands={g['nbands']} coltiles={g['nctiles']} "
          f"backend={jax.default_backend()}")

    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter
    tex = gaussian_filter(rng.random((H, W)).astype(np.float32), 2.0) * 255
    shifted = np.roll(np.roll(tex, 2, 0), 3, 1)
    p = jnp.asarray(tex)[..., None]
    c = jnp.asarray(shifted)[..., None]
    R0 = jnp.transpose(_poly_exp(p, 8, 1.2), (2, 3, 0, 1))
    R1 = jnp.transpose(_poly_exp(c, 8, 1.2), (2, 3, 0, 1))
    border = _border_scale_map(H, W)

    for halo in args.halo.split(","):
        bpi = bytes_per_iter(H, W, g, halo)
        fpi = flops_per_iter(H, W, g)
        t_mem = bpi / (args.hbm_gbs * 1e9) * 1e3     # ms, memory roof
        t_vpu = fpi / (args.vpu_tops * 1e12) * 1e3   # ms, compute roof
        print(f"\n[{halo}] per-iteration accounting: "
              f"{bpi / 1e6:.1f} MB, {fpi / 1e9:.2f} Gop "
              f"-> roofs/iter: mem {t_mem:.3f} ms, vpu {t_vpu:.3f} ms "
              f"({'VPU' if t_vpu > t_mem else 'HBM'}-bound, "
              f"arithmetic intensity {fpi / bpi:.1f} op/B)")

        for batch in (int(b) for b in args.batches.split(",")):
            R0b = jnp.tile(R0, (batch, 1, 1, 1))
            R1b = jnp.tile(R1, (batch, 1, 1, 1))
            f0 = jnp.zeros((batch, 2, H, W), jnp.float32)

            it = functools.partial(
                farneback_iterate_pallas, iterations=args.iterations,
                winsize=12, max_shift=args.max_shift,
                band_rows=args.band_rows, halo=halo)

            @jax.jit
            def rep(r0, r1, f, n):
                def body(i, acc):
                    out = it(r0 + i.astype(jnp.float32) * 1e-6, r1, f, border)
                    return acc + jnp.float32(jnp.sum(out[:, :, ::64, ::64]))
                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            float(rep(R0b, R1b, f0, 1))  # compile+warm
            n_hi = max(33 // batch, 3)
            while True:
                t0 = time.perf_counter()
                float(rep(R0b, R1b, f0, 1))
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(rep(R0b, R1b, f0, n_hi))
                tn = time.perf_counter() - t0
                if tn - t1 > 0.5 or n_hi >= 4096:
                    break
                n_hi *= 4
            ms_frame = (tn - t1) / ((n_hi - 1) * batch) * 1e3
            ms_iter = ms_frame / args.iterations
            light = max(t_mem, t_vpu)
            print(json.dumps({
                "halo": halo, "batch": batch,
                "ms_per_frame": round(ms_frame, 3),
                "ms_per_iter": round(ms_iter, 4),
                "achieved_GBps": round(bpi / (ms_iter * 1e-3) / 1e9, 1),
                "achieved_Tops": round(fpi / (ms_iter * 1e-3) / 1e12, 2),
                "pct_of_roof": round(100 * light / ms_iter, 1),
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
