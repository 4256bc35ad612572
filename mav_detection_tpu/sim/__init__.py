from mav_detection_tpu.sim.sim_config import FlightMode, Orientation, SimConfig
from mav_detection_tpu.sim.client import AirSimClient, MockSimClient, Vector3
from mav_detection_tpu.sim.control import SimDataCollector

__all__ = [
    "FlightMode",
    "Orientation",
    "SimConfig",
    "AirSimClient",
    "MockSimClient",
    "Vector3",
    "SimDataCollector",
]
