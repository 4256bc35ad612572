"""Idempotent sequence preprocessing (host-side).

The reference Dataset runs these at init (``dataset.py:47-105,232-264``):
mp4 -> png extraction, jpg -> png conversion, index renormalization,
png -> mp4 assembly, half-resolution copies. All steps are skip-if-exists
(artifact-cache idiom) and ffmpeg-gated.

Also carries the auxiliary capture-source helpers the reference keeps in
utils (KITTI / Cenek-Albl path conventions, ``utils.py:141-175``).
"""
from __future__ import annotations

import glob
import os
import re
import shutil
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from mav_detection_tpu.data.dataset import create_if_not_exists, imread, imwrite, sorted_glob


def _have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def video_to_images(video_path: str, img_pattern: str) -> bool:
    """mp4 -> image_%5d.png via ffmpeg (reference ``utils.video_to_img``)."""
    out_dir = os.path.dirname(img_pattern)
    create_if_not_exists(out_dir)
    if glob.glob(os.path.join(out_dir, "image_*.png")):
        return True
    if not _have_ffmpeg():
        return False
    subprocess.call(["ffmpeg", "-loglevel", "error", "-i", video_path, img_pattern])
    return True


def images_to_video(img_pattern: str, video_path: str, framerate: int = 30) -> bool:
    """image sequence -> mp4 (reference ``utils.img_to_video``)."""
    if os.path.exists(video_path):
        return True
    if not _have_ffmpeg():
        return False
    imgs = sorted_glob(os.path.join(os.path.dirname(img_pattern), "image_*.png"))
    if not imgs:
        return False
    m = re.search(r"image_(\d+)", os.path.basename(imgs[0]))
    start = m.group(1) if m else "0"
    subprocess.call([
        "ffmpeg", "-loglevel", "error", "-start_number", start,
        "-r", str(framerate), "-i", img_pattern,
        "-c:v", "libx264", "-vf", f"fps={framerate}", "-pix_fmt", "yuv420p",
        video_path, "-y"])
    return os.path.exists(video_path)


def jpgs_to_pngs(img_dir: str) -> int:
    """Convert stray .jpg frames to the canonical image_%05d.png naming."""
    converted = 0
    for jpg in sorted_glob(os.path.join(img_dir, "*.jpg")):
        stem = os.path.splitext(os.path.basename(jpg))[0]
        digits = re.sub(r"\D", "", stem) or str(converted)
        frame = imread(jpg)
        imwrite(os.path.join(img_dir, f"image_{int(digits):05d}.png"), frame)
        os.remove(jpg)
        converted += 1
    return converted


def renormalize_indices(base_dir: str) -> int:
    """Rename image_*/annot files so indices start at 0 and are contiguous
    (reference ``reorder_pngs``/``reorder_anns``)."""
    files = sorted_glob(os.path.join(base_dir, "image_*"))
    moved = 0
    for i, path in enumerate(files):
        ext = os.path.splitext(path)[1]
        target = os.path.join(base_dir, f"image_{i:05d}{ext}")
        if os.path.abspath(path) != os.path.abspath(target):
            shutil.move(path, target)
            moved += 1
    return moved


def create_half_res_images(img_dir: str, out_dir: str) -> int:
    """50%-scale copies for the sky-segmentation model (reference
    ``create_half_res_images``), skip-if-exists."""
    create_if_not_exists(out_dir)
    written = 0
    for src in sorted_glob(os.path.join(img_dir, "image_*.png")):
        dst = os.path.join(out_dir, os.path.basename(src))
        if os.path.exists(dst):
            continue
        img = imread(src)
        half = img[::2, ::2]
        imwrite(dst, half)
        written += 1
    return written


# ------------------------------------------------- auxiliary capture paths
def get_kitti_image_dir(sequence: str) -> str:
    """KITTI odometry grayscale layout (reference ``utils.get_kitti_path``)."""
    kitti = os.environ["KITTI_PATH"]
    return f"{kitti}/data_odometry_gray/dataset/sequences/{sequence}/image_0"


def get_cenek_paths(sequence: str, camera: int) -> Tuple[str, str]:
    """Cenek-Albl et al. drone-detection dataset layout
    (reference ``utils.get_cenek_path``)."""
    base = os.environ["CENEK_PATH"]
    return (f"{base}/{sequence}/{camera}.mp4",
            f"{base}/{sequence}/detections/{camera}.txt")
