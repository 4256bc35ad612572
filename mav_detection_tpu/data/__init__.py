from mav_detection_tpu.data.dataset import Dataset
from mav_detection_tpu.data.synthetic import SyntheticDataset
from mav_detection_tpu.data.midgard import MidgardDataset
from mav_detection_tpu.data.sim_data import SimDataset
from mav_detection_tpu.data.vis_drone import VisDroneDataset
from mav_detection_tpu.data.experiment import ExperimentDataset


def make_dataset(dataset_type, logger=None, sequence: str = ""):
    """Dataset factory mirroring the reference's RunConfig.get_dataset
    (``/root/reference/src/run_config.py:114-129``) plus the synthetic fixture."""
    from mav_detection_tpu.core.config import DatasetType

    if dataset_type == DatasetType.MIDGARD:
        return MidgardDataset(logger, sequence)
    if dataset_type == DatasetType.SIMULATION:
        return SimDataset(logger, sequence)
    if dataset_type == DatasetType.VIS_DRONE:
        return VisDroneDataset(logger, sequence)
    if dataset_type == DatasetType.EXPERIMENT:
        return ExperimentDataset(logger, sequence)
    if dataset_type == DatasetType.SYNTHETIC:
        return SyntheticDataset(logger, sequence)
    raise ValueError(f"Invalid dataset type: {dataset_type}")


__all__ = [
    "Dataset",
    "SyntheticDataset",
    "MidgardDataset",
    "SimDataset",
    "VisDroneDataset",
    "ExperimentDataset",
    "make_dataset",
]
