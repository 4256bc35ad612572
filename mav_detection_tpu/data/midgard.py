"""MIDGARD dataset (752x480 real drone footage).

Env-var + default-sequence contract of ``/root/reference/src/datasets/midgard.py``.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

from mav_detection_tpu.data.dataset import Dataset


class MidgardDataset(Dataset):
    def __init__(self, logger: Optional[logging.Logger] = None,
                 sequence: str = "") -> None:
        base = os.environ["MIDGARD_PATH"]
        super().__init__(base, logger, sequence)

    def get_default_sequence(self) -> str:
        return "countryside-natural/north-narrow"
