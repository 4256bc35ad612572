"""Default pretrained-weight resolution for the three learned models.

The reference consumed externally-hosted weights (FlowNet2/HRNet docker
images, YOLOv4 run-ids in settings.json — ``/root/reference/src/datasets/
dataset.py:107-123``, ``validator.py:61-93``); here weights are first-class
repo artifacts: single msgpack files under ``checkpoints/`` (override the
root with ``MAV_CHECKPOINT_PATH``), produced by ``python -m
mav_detection_tpu.cli.train`` and loaded automatically by the flow /
sky-segmentation / detection paths.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Optional

logger = logging.getLogger("mav_detection_tpu")

_CACHE: dict = {}


def checkpoint_root() -> str:
    env = os.environ.get("MAV_CHECKPOINT_PATH")
    if env:
        return env
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "checkpoints")


def checkpoint_path(name: str) -> str:
    return os.path.join(checkpoint_root(), f"{name}.msgpack")


def has_checkpoint(name: str) -> bool:
    return os.path.exists(checkpoint_path(name))


def load_raft_params(config=None) -> Optional[Any]:
    """Trained RAFT params, or None when no checkpoint is shipped."""
    from mav_detection_tpu.models import checkpoint
    from mav_detection_tpu.models.raft import RAFTConfig, create_raft

    config = config or RAFTConfig()
    key = ("raft", config)
    if key in _CACHE:
        return _CACHE[key]
    path = checkpoint_path("raft")
    if not os.path.exists(path):
        return None
    # conv-only model: param shapes are independent of image size, so a tiny
    # init supplies the pytree template cheaply
    _, like = create_raft(config=config, image_hw=(64, 96))
    params = checkpoint.load_msgpack(path, like,
                                     migrate=_migrate_raft_state)
    _CACHE[key] = params
    logger.info(f"loaded RAFT weights from {path}")
    return params


def _migrate_raft_state(state: Any) -> Any:
    """Pre-mask-hoist checkpoints kept the convex-upsample mask head inside
    the per-iteration update block (refine/update/{Conv_6, mask_head});
    it now lives at the RAFT level as mask_hidden/mask_head (computed once
    per inference from the final hidden state — models/raft.py UpdateBlock
    docstring). Pure key move, weights unchanged; Conv_0..Conv_5 numbering
    is unaffected because the hoisted conv was the last anonymous one."""
    p = state.get("params", state)
    upd = p.get("refine", {}).get("update", {})
    if "mask_head" in upd:
        p["mask_head"] = upd.pop("mask_head")
        p["mask_hidden"] = upd.pop("Conv_6")
        logger.info("migrated pre-hoist RAFT checkpoint layout "
                    "(refine/update mask head -> top-level)")
    return state


def load_sky_params() -> Optional[Any]:
    from mav_detection_tpu.models import checkpoint
    from mav_detection_tpu.models.sky_segmentation import create_sky_model

    if "sky" in _CACHE:
        return _CACHE["sky"]
    path = checkpoint_path("sky")
    if not os.path.exists(path):
        return None
    _, like = create_sky_model(image_hw=(64, 96))
    params = checkpoint.load_msgpack(path, like)
    _CACHE["sky"] = params
    logger.info(f"loaded sky-segmentation weights from {path}")
    return params


def yolo_checkpoint_name(mode: Optional[str] = None) -> str:
    """Checkpoint name for a detection mode — the analogue of the
    reference's per-mode ``yolo_train_weights`` run-id map
    (``/root/reference/settings.json:2-4``): ``yolo`` for APPEARANCE_RGB,
    ``yolo_flow_uv`` etc. for the flow-imagery modes."""
    if not mode or mode == "APPEARANCE_RGB":
        return "yolo"
    return f"yolo_{mode.lower()}"


def resolve_yolo_checkpoint(mode: Optional[str] = None) -> str:
    """Path of the checkpoint :func:`load_yolo_params` would use for this
    mode: the per-mode file when shipped, else the RGB-trained fallback."""
    path = checkpoint_path(yolo_checkpoint_name(mode))
    if os.path.exists(path):
        return path
    return checkpoint_path("yolo")


def load_yolo_params(mode: Optional[str] = None) -> Optional[Any]:
    """TinyYOLO params for a detection mode, falling back to the
    RGB-trained weights when no per-mode checkpoint is shipped."""
    from mav_detection_tpu.models import checkpoint
    from mav_detection_tpu.models.yolo import create_yolo

    name = yolo_checkpoint_name(mode)
    path = checkpoint_path(name)
    if not os.path.exists(path):
        if name != "yolo":
            logger.warning(
                f"no per-mode YOLO checkpoint {path}; falling back to the "
                "RGB-trained weights — train mode weights with "
                f"`python -m mav_detection_tpu.cli.train --model yolo "
                f"--yolo-mode {mode}`")
            return load_yolo_params(None)
        return None
    if name in _CACHE:
        return _CACHE[name]
    _, like = create_yolo(image_hw=(64, 96))
    params = checkpoint.load_msgpack(path, like)
    _CACHE[name] = params
    logger.info(f"loaded YOLO weights from {path}")
    return params


def clear_cache() -> None:
    _CACHE.clear()
