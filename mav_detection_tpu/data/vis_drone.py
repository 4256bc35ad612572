"""VisDrone dataset (images under <base>/sequences/<seq>/).

Env-var + layout contract of ``/root/reference/src/datasets/vis_drone.py``.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

from mav_detection_tpu.data.dataset import Dataset


class VisDroneDataset(Dataset):
    def __init__(self, logger: Optional[logging.Logger] = None,
                 sequence: str = "") -> None:
        base = os.environ["VIS_DRONE_PATH"]
        super().__init__(base, logger, sequence, img_dir="", seq_dir="/sequences")

    def get_default_sequence(self) -> str:
        return "uav0000244_01440_v"
