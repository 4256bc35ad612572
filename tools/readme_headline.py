"""Regenerate README.md's driver-recorded throughput rows from the latest
``BENCH_r*.json`` (VERDICT r4 #4: rounds 2-4 each shipped a headline that a
later artifact contradicted — the row is now GENERATED, never hand-edited).

The generated block sits between ``<!-- bench:begin -->`` / ``<!-- bench:end
-->`` markers. Each row cites the artifact it came from; when the artifact
carries the round-5 chip-health canary fields the verdict is quoted inline,
and artifacts from a chip the canary (or a post-mortem) condemned render the
anomaly instead of quietly presenting a wrong number as the framework's.

Run after every driver bench capture:
    python tools/readme_headline.py        # rewrites README.md in place
    python tools/readme_headline.py --check  # exit 1 if README is stale
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN, END = "<!-- bench:begin -->", "<!-- bench:end -->"

# Artifacts from captures a post-mortem condemned: the number of record for
# that round is the ENVIRONMENT's, not the framework's. Keyed by round; the
# value names the evidence. (BENCH_r04 predates the in-artifact canary; from
# round 5 on, chip_health inside the JSON makes this table unnecessary.)
KNOWN_BAD_CAPTURES = {
    4: "degraded/contended tunnel chip — same code re-measured at 369.5 fps "
       "batch-8 with a healthy 183 TFLOP/s matmul canary; see PERF.md "
       "\"BENCH_r04 post-mortem\"",
}


def latest_artifact() -> tuple[int, dict]:
    rounds = {}
    for p in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m:
            rounds[int(m.group(1))] = p
    if not rounds:
        raise SystemExit("no BENCH_r*.json artifacts found")
    n = max(rounds)
    with open(rounds[n]) as f:
        return n, json.load(f)


def render_rows(n: int, art: dict) -> str:
    p = art.get("parsed", art)
    health = p.get("chip_health", "")
    bad = KNOWN_BAD_CAPTURES.get(n, "")
    if health and health != "ok":
        bad = f"in-artifact canary: `{health}`"

    rows = []
    if bad:
        rows.append(
            f"| Flow + detect throughput @752×480 (driver artifact of record) "
            f"| `BENCH_r{n:02d}.json` records {p.get('fps_batch8', p.get('value'))} "
            f"fps/chip batch-8 — **capture condemned**: {bad}. The last "
            f"healthy-chip measurement of the same code is in PERF.md |")
        hires = p.get("hires") or {}
        if hires:
            rows.append(
                f"| Flow + detect @1920×1024 (same artifact) | "
                f"{hires.get('fps_batch8')} fps/chip — same condemned capture; "
                f"healthy-chip value in PERF.md \"Reference resolution\" |")
        return "\n".join(rows)

    cfg = p.get("config", {})
    canary = ""
    if "canary_matmul_tflops" in p:
        canary = (f"; chip certified healthy in-artifact "
                  f"({p['canary_matmul_tflops']:.0f} TFLOP/s matmul canary, "
                  f"bare kernel {p['kernel_ms_per_iter']:.3f} ms/iter)")
    rows.append(
        f"| Flow + detect throughput @752×480, non-uniform flow (~9 px) | "
        f"**{p.get('fps_batch8', p.get('value')):.1f} fps/chip batch-8 "
        f"(product config), {p.get('fps_single', float('nan')):.1f} fps "
        f"single-stream = {p.get('vs_baseline', float('nan')):.1f}× "
        f"OpenCV-CPU** (`BENCH_r{n:02d}.json`; target ≥20×; Pallas fused "
        f"kernel, S={cfg.get('max_shift')}, {cfg.get('band_rows')}-row bands, "
        f"{cfg.get('iterations')} iters — PERF.md){canary} |")
    hires = p.get("hires") or {}
    if hires:
        hcfg = hires.get("config", {})
        rows.append(
            f"| Flow + detect @1920×1024 (the reference's native AirSim "
            f"resolution) | **{hires.get('fps_batch8'):.1f} fps/chip batch-8 "
            f"= {hires.get('vs_baseline'):.1f}× the in-run cv2-CPU baseline "
            f"({hires.get('baseline_ms_per_frame', 0) / 1e3:.2f} s/frame)** "
            f"at EPE {hires.get('epe_gt'):.3f} px vs analytic GT — within 2% "
            f"of cv2's own 3-level-pyramid floor (0.476) on the same "
            f"~11.6 px-motion scene; `tuned_flow_params(h, w)` auto-selects "
            f"max_shift={hcfg.get('max_shift')}/band_rows={hcfg.get('band_rows')} "
            f"(`BENCH_r{n:02d}.json` hires fields, re-measured every run) |")
    return "\n".join(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if README's block is stale instead of writing")
    args = ap.parse_args()

    n, art = latest_artifact()
    block = f"{BEGIN}\n{render_rows(n, art)}\n{END}"
    readme = os.path.join(REPO, "README.md")
    with open(readme) as f:
        text = f.read()
    if BEGIN not in text or END not in text:
        raise SystemExit(f"README.md lacks the {BEGIN} … {END} markers")
    new = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END), block, text,
                 flags=re.S)
    if args.check:
        if new != text:
            print("README.md bench block is STALE — run "
                  "tools/readme_headline.py")
            return 1
        print("README.md bench block is current")
        return 0
    if new != text:
        with open(readme, "w") as f:
            f.write(new)
        print(f"README.md bench block regenerated from BENCH_r{n:02d}.json")
    else:
        print("README.md already current")
    return 0


if __name__ == "__main__":
    sys.exit(main())
