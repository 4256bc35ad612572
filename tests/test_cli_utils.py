"""Tests for the small CLI utilities closing the reference's misc-script
inventory (SURVEY §2a "Misc scripts" / VERDICT r4 #8): the mp4 helper
recipes (``etc/bash/*.sh``), the depth-capture smoke (``airsim-demo.py``),
and the README headline generator (VERDICT r4 #4)."""
from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestVideoCLI:
    def _cmd(self, argv):
        from mav_detection_tpu.cli.video import build_parser

        args = build_parser().parse_args(argv)
        return args.build(args)

    def test_crop_matches_reference_recipe(self):
        # /root/reference/etc/bash/crop_mp4.sh: crop=2048:1350:0:186
        cmd = self._cmd(["crop", "rec.mp4", "out.mp4", "--width", "2048",
                         "--height", "1350", "--y", "186"])
        assert "crop=2048:1350:0:186" in " ".join(cmd)
        assert cmd[0] == "ffmpeg"

    def test_skip_frames_preserves_playback_rate(self):
        # mp4_skip_frames.sh: select every 4th + setpts 0.25
        cmd = " ".join(self._cmd(["skip-frames", "a.mp4", "b.mp4"]))
        assert "not(mod(n\\,4))" in cmd
        assert "setpts=0.25*PTS" in cmd

    def test_shorten_stream_copies(self):
        cmd = self._cmd(["shorten", "a.mp4", "b.mp4", "--start",
                         "00:04:54.0", "--duration", "00:00:15.0"])
        i = cmd.index("-ss")
        assert cmd[i + 1] == "00:04:54.0"
        assert "copy" in cmd

    def test_pngs_to_mp4_yuv420(self):
        cmd = " ".join(self._cmd(["pngs-to-mp4", "image_%05d.png", "o.mp4"]))
        assert "libx264" in cmd and "yuv420p" in cmd

    def test_frame_count_uses_ffprobe(self):
        cmd = self._cmd(["frame-count", "a.mp4"])
        assert cmd[0] == "ffprobe" and "-count_packets" in cmd

    def test_select_frame(self):
        cmd = " ".join(self._cmd(["select-frame", "a.mp4", "f.png",
                                  "--frame", "127"]))
        assert "between(n\\,127\\,127)" in cmd

    def test_dry_run_executes_nothing(self, capsys):
        from mav_detection_tpu.cli.video import main

        rc = main(["--dry-run", "frame-count", "/nonexistent.mp4"])
        assert rc == 0
        assert "ffprobe" in capsys.readouterr().out


class TestDepthDemo:
    def test_mock_depth_smoke(self, tmp_path):
        """The airsim-demo.py equivalent end-to-end on the hermetic mock:
        one capture, jet-colormapped depth png on disk."""
        from mav_detection_tpu.cli.demo import main

        out = str(tmp_path / "test.png")
        rc = main(["--image-size", "48x64", "--out", out])
        assert rc == 0
        import cv2

        img = cv2.imread(out)
        assert img is not None and img.shape == (48, 64, 3)
        # jet-mapped depth must not be a constant image (ground gradient)
        assert img.std() > 1.0


class TestReadmeHeadline:
    def test_readme_block_is_current(self):
        """README's bench block must always match the newest BENCH_r*.json
        (the r2/r3/r4 headline-drift class, now structurally impossible)."""
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools/readme_headline.py"),
             "--check"], capture_output=True, text=True)
        assert rc.returncode == 0, rc.stdout + rc.stderr

    def test_condemned_capture_renders_anomaly(self, tmp_path, monkeypatch):
        """An artifact from a chip its own canary condemned must render the
        anomaly, not present the degraded number as the framework's."""
        import tools.readme_headline as rh

        art = {"parsed": {"value": 12.0, "fps_batch8": 12.0,
                          "fps_single": 11.0, "vs_baseline": 2.5,
                          "chip_health": "DEGRADED(canary_matmul 31 TFLOP/s)",
                          "config": {}}}
        rows = rh.render_rows(99, art)
        assert "condemned" in rows
        assert "DEGRADED" in rows

    def test_healthy_capture_renders_canary_fields(self):
        import tools.readme_headline as rh

        art = {"parsed": {
            "value": 370.0, "fps_batch8": 370.0, "fps_single": 357.0,
            "vs_baseline": 70.0, "chip_health": "ok",
            "canary_matmul_tflops": 183.0, "kernel_ms_per_iter": 0.275,
            "config": {"max_shift": 8, "band_rows": 24, "iterations": 6},
            "hires": {"fps_batch8": 35.3, "vs_baseline": 39.5,
                      "epe_gt": 0.486, "baseline_ms_per_frame": 2700.0,
                      "config": {"max_shift": 16, "band_rows": 32}}}}
        rows = rh.render_rows(99, art)
        assert "370.0 fps/chip batch-8" in rows
        assert "183 TFLOP/s" in rows
        assert "35.3 fps/chip" in rows
        assert "condemned" not in rows
