"""Typed run configuration.

One dataclass replaces the reference's three-tier config system (argparse +
CWD-sensitive ``settings.json`` + env vars; see
``/root/reference/src/run_config.py:13-129``) while preserving the same CLI
surface, enum names, dataset factory, and settings-file schema.
"""
from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Dict, List, Optional


class Mode(Enum):
    """Detection modes, names identical to the reference's RunConfig.Mode."""

    APPEARANCE_RGB = 0
    FLOW_UV = 1
    FLOW_RADIAL = 2
    FLOW_FOE_YOLO = 3
    FLOW_FOE_CLUSTERING = 4

    def __str__(self) -> str:
        return self.name


class DatasetType(Enum):
    MIDGARD = 0
    SIMULATION = 1
    EXPERIMENT = 2
    VIS_DRONE = 3
    SYNTHETIC = 4  # new: procedurally generated fixture (CI-friendly, no AirSim)

    def __str__(self) -> str:
        return self.name


class Algorithm(Enum):
    """Ego-motion algorithms (reference: ``detector.py:15-21``)."""

    NONE = 0
    FOE = 1
    AFFINE = 2
    HOMOGRAPHY = 3
    FUNDAMENTAL = 4
    ESSENTIAL = 5


class FlowSource(Enum):
    """Where dense flow comes from (replaces the FlowNet2 docker sidecar)."""

    PRECOMPUTED = 0  # .flo files on disk (reference-compatible)
    FARNEBACK = 1    # on-device Farneback kernels
    LUCAS_KANADE = 2 # on-device pyramidal LK densified
    RAFT = 3         # on-device RAFT-style network
    GROUND_TRUTH = 4 # synthetic/sim GT flow


def _parse_enum(enum_cls: Any, key: str) -> Any:
    options = [m.name for m in enum_cls]
    k = key.upper()
    if k not in options:
        raise ValueError(
            f"{key} is not a valid {enum_cls.__name__}, has to be one of {', '.join(options)}"
        )
    return enum_cls[k]


DEFAULT_SETTINGS: Dict[str, Any] = {
    "train_sequences": [],
    "validation_sequences": [],
    "yolo_train_weights": {},
}


def load_settings(path: Optional[str] = None) -> Dict[str, Any]:
    """Load ``settings.json``; search CWD then the repo root, else defaults."""
    candidates = [path] if path else [
        os.path.join(os.getcwd(), "settings.json"),
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "settings.json"),
    ]
    for cand in candidates:
        if cand and os.path.exists(cand):
            with open(cand, "r") as f:
                loaded = json.load(f)
            merged = dict(DEFAULT_SETTINGS)
            merged.update(loaded)
            return merged
    return dict(DEFAULT_SETTINGS)


@dataclass
class RunConfig:
    dataset: str = "midgard"
    sequence: str = ""
    mode: Mode = Mode.FLOW_UV
    algorithm: Algorithm = Algorithm.ESSENTIAL
    flow_source: FlowSource = FlowSource.PRECOMPUTED
    debug: bool = False
    prepare_dataset: bool = False
    validate: bool = False
    headless: bool = True
    data_to_yolo: bool = False
    undistort: bool = False
    batch_size: int = 8
    # dense-FoE sampling budget for the fused detection step; the
    # reference's constant is 1000 (focus_of_expansion.py:65). Larger values
    # tighten the vote at high resolutions for ~free on the MXU.
    foe_samples: int = 1000
    # use sparse LK feature tracks instead of grid-sampled flow as the
    # transform-fit correspondences in the homography branch (the reference's
    # ``Detector(use_sparse_of=...)`` constructor flag, detector.py:23,130-136
    # — unreachable from its CLI; exposed here as ``--use-sparse-of``)
    use_sparse_of: bool = False
    # number of devices for frame-batch data parallelism: 0 = single-device,
    # N > 1 = shard each frame batch over an N-device ``data`` mesh
    devices: int = 0
    # frame engine: "batch" = fused detection over frame batches (default),
    # "scan" = one lax.scan program over the whole sequence with carried
    # temporal state, "chunked" = time chunks sharded over the mesh with a
    # ppermute'd halo frame (needs devices > 1), "spatial" = each frame's
    # Farneback solve row-sharded over the mesh for per-frame LATENCY
    # scaling at high resolutions (needs devices > 1; parallel/spatial.py).
    # SURVEY §2c "temporal scan" / tensor-spatial axis.
    engine: str = "batch"
    settings_path: Optional[str] = None
    logger: Optional[logging.Logger] = None
    settings: Dict[str, Any] = field(default_factory=dict)
    results: Dict[int, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if isinstance(self.mode, str):
            self.mode = _parse_enum(Mode, self.mode)
        if isinstance(self.algorithm, str):
            self.algorithm = _parse_enum(Algorithm, self.algorithm)
        if isinstance(self.flow_source, str):
            self.flow_source = _parse_enum(FlowSource, self.flow_source)
        if self.engine not in ("batch", "scan", "chunked", "spatial"):
            raise ValueError(
                f"engine={self.engine!r}: must be batch, scan, chunked or "
                "spatial")
        if not self.settings:
            self.settings = load_settings(self.settings_path)
        if self.logger is None:
            self.logger = logging.getLogger("mav_detection_tpu")

    # -- reference-compatible helpers ---------------------------------------
    def get_dataset_type(self) -> DatasetType:
        return _parse_enum(DatasetType, self.dataset)

    def uses_nn_for_detection(self) -> bool:
        return self.mode in (Mode.FLOW_UV, Mode.FLOW_RADIAL, Mode.FLOW_FOE_YOLO)

    def get_all_sequences(self) -> List[str]:
        return list(self.settings.get("train_sequences", [])) + list(
            self.settings.get("validation_sequences", [])
        )

    def get_dataset(self):  # -> data.Dataset (late import to avoid cycles)
        from mav_detection_tpu.data import make_dataset

        ds = make_dataset(self.get_dataset_type(), self.logger, self.sequence)
        self.sequence = ds.sequence
        return ds

    def __str__(self) -> str:
        return f"{self.dataset}/{self.sequence}/{self.mode}"
