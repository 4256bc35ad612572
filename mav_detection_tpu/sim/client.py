"""Simulator client abstraction.

The reference talks msgpack-RPC to AirSim/UE4 directly
(``/root/reference/src/airsim-control.py:85-108``); here the choreography is
written against a small ``SimClient`` interface with two implementations:

* ``AirSimClient`` — thin adapter over the real ``airsim`` package (lazy
  import; raises a clear error when the package/simulator is unavailable).
* ``MockSimClient`` — a kinematic point-mass simulator with a pinhole-camera
  renderer. It integrates velocity commands, steps sim time, and synthesizes
  Scene/Depth/Segmentation captures (target drone rendered as a disc), so the
  entire data-collection stack runs hermetically in CI and produces
  pipeline-consumable sequences.
"""
from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class Vector3:
    x_val: float = 0.0
    y_val: float = 0.0
    z_val: float = 0.0

    def __add__(self, o: "Vector3") -> "Vector3":
        return Vector3(self.x_val + o.x_val, self.y_val + o.y_val, self.z_val + o.z_val)

    def __sub__(self, o: "Vector3") -> "Vector3":
        return Vector3(self.x_val - o.x_val, self.y_val - o.y_val, self.z_val - o.z_val)

    def __mul__(self, s: float) -> "Vector3":
        return Vector3(self.x_val * s, self.y_val * s, self.z_val * s)

    def get_length(self) -> float:
        return math.sqrt(self.x_val ** 2 + self.y_val ** 2 + self.z_val ** 2)

    def to_numpy(self) -> np.ndarray:
        return np.array([self.x_val, self.y_val, self.z_val])


@dataclass
class ImageResponse:
    image_type: str            # "scene" | "depth" | "segmentation"
    pixels_as_float: bool
    data: np.ndarray           # (h, w[, 3]) uint8 or float32


class SimClient:
    """Interface consumed by the data-collection choreography."""

    def confirm_connection(self) -> None: ...
    def set_segmentation_ids(self) -> None: ...
    def enable_api_control(self, enable: bool, vehicle: str) -> None: ...
    def arm_disarm(self, arm: bool, vehicle: str) -> None: ...
    def get_position(self, vehicle: str) -> Vector3: ...
    def get_yaw(self, vehicle: str) -> float: ...
    def is_landed(self, vehicle: str) -> bool: ...
    def takeoff(self, vehicle: str) -> None: ...
    def set_pose(self, vehicle: str, position: Vector3, yaw: float) -> None: ...
    def move_to_position(self, vehicle: str, target: Vector3, speed: float) -> None: ...
    def move_by_velocity_z(self, vehicle: str, vx: float, vy: float, z: float,
                           yaw_deg: Optional[float] = None,
                           yaw_rate: Optional[float] = None) -> None: ...
    def land(self, vehicle: str) -> None: ...
    def continue_for_time(self, seconds: float) -> None: ...
    def pause(self, paused: bool) -> None: ...
    def capture(self, vehicle: str) -> List[ImageResponse]: ...
    def get_state(self, vehicle: str) -> Dict: ...
    def sim_time_ns(self) -> int: ...


# ---------------------------------------------------------------- AirSim
class AirSimClient(SimClient):
    """Adapter over the real airsim msgpack-RPC client."""

    def __init__(self, ip: Optional[str] = None, retry_forever: bool = True) -> None:
        try:
            import airsim  # type: ignore
        except ImportError as e:
            raise ImportError(
                "the 'airsim' package is not installed in this environment; "
                "use MockSimClient for hermetic data generation or install "
                "airsim where an UE4 simulator is reachable") from e
        self._airsim = airsim
        while True:
            try:
                self.client = airsim.MultirotorClient(ip=ip)
                self.client.confirmConnection()
                break
            except Exception:
                if not retry_forever:
                    raise
                time.sleep(1)

    def confirm_connection(self) -> None:
        self.client.confirmConnection()

    def set_segmentation_ids(self) -> None:
        self.client.simSetSegmentationObjectID("[\\w]*", 0, True)
        self.client.simSetSegmentationObjectID("Drone[\\w]*", 255, True)

    def enable_api_control(self, enable: bool, vehicle: str) -> None:
        self.client.enableApiControl(enable, vehicle)

    def arm_disarm(self, arm: bool, vehicle: str) -> None:
        self.client.armDisarm(arm, vehicle)

    def get_position(self, vehicle: str) -> Vector3:
        p = self.client.getMultirotorState(vehicle_name=vehicle).kinematics_estimated.position
        return Vector3(p.x_val, p.y_val, p.z_val)

    def get_yaw(self, vehicle: str) -> float:
        from scipy.spatial.transform import Rotation

        o = self.client.getMultirotorState(vehicle_name=vehicle).kinematics_estimated.orientation
        return float(Rotation.from_quat([o.x_val, o.y_val, o.z_val, o.w_val])
                     .as_euler("xyz")[2])

    def is_landed(self, vehicle: str) -> bool:
        return (self.client.getMultirotorState(vehicle_name=vehicle).landed_state
                == self._airsim.LandedState.Landed)

    def takeoff(self, vehicle: str) -> None:
        if self.is_landed(vehicle):
            self.client.takeoffAsync(vehicle_name=vehicle).join()

    def set_pose(self, vehicle: str, position: Vector3, yaw: float) -> None:
        a = self._airsim
        pose = a.Pose(a.Vector3r(position.x_val, position.y_val, position.z_val),
                      a.to_quaternion(0.0, 0.0, yaw))
        self.client.simSetVehiclePose(pose, True, vehicle_name=vehicle)

    def move_to_position(self, vehicle: str, target: Vector3, speed: float) -> None:
        self.client.moveToPositionAsync(target.x_val, target.y_val, target.z_val,
                                        speed, vehicle_name=vehicle).join()

    def move_by_velocity_z(self, vehicle: str, vx: float, vy: float, z: float,
                           yaw_deg: Optional[float] = None,
                           yaw_rate: Optional[float] = None) -> None:
        a = self._airsim
        if yaw_rate is not None:
            yaw_mode = a.YawMode(True, yaw_rate)
        elif yaw_deg is not None:
            yaw_mode = a.YawMode(False, yaw_deg)
        else:
            yaw_mode = a.YawMode()
        self.client.moveByVelocityZAsync(
            vx, vy, z, 10, a.DrivetrainType.MaxDegreeOfFreedom, yaw_mode,
            vehicle_name=vehicle)

    def land(self, vehicle: str) -> None:
        self.client.landAsync(vehicle_name=vehicle).join()

    def continue_for_time(self, seconds: float) -> None:
        self.client.simContinueForTime(seconds)

    def pause(self, paused: bool) -> None:
        self.client.simPause(paused)

    def capture(self, vehicle: str) -> List[ImageResponse]:
        a = self._airsim
        responses = self.client.simGetImages([
            a.ImageRequest("segment", a.ImageType.Segmentation),
            a.ImageRequest("high_res", a.ImageType.Scene),
            a.ImageRequest("depth", a.ImageType.DepthPerspective, True),
        ], vehicle_name=vehicle)
        out = []
        kind = {a.ImageType.Scene: "scene", a.ImageType.DepthPerspective: "depth",
                a.ImageType.Segmentation: "segmentation"}
        for r in responses:
            if r.pixels_as_float:
                data = np.array(a.get_pfm_array(r), np.float32)
            else:
                data = np.frombuffer(r.image_data_uint8, np.uint8)
                if r.height and r.width:
                    data = data.reshape(r.height, r.width, -1)
            out.append(ImageResponse(kind[r.image_type], r.pixels_as_float, data))
        return out

    def get_state(self, vehicle: str) -> Dict:
        state = self.client.getMultirotorState(vehicle_name=vehicle)
        imu = self.client.getImuData(imu_name="Imu", vehicle_name=vehicle)
        import json

        def jsonify(o):
            return json.loads(json.dumps(o, default=lambda x: getattr(x, "__dict__", str(x))))

        d = jsonify(state)
        d["imu"] = jsonify(imu)
        return d

    def sim_time_ns(self) -> int:
        return time.time_ns()


# ------------------------------------------------------------------ mock
@dataclass
class _Drone:
    position: np.ndarray = field(default_factory=lambda: np.zeros(3))
    velocity: np.ndarray = field(default_factory=lambda: np.zeros(3))
    yaw: float = 0.0
    yaw_rate: float = 0.0
    landed: bool = True
    armed: bool = False
    target_z: Optional[float] = None


class MockSimClient(SimClient):
    """Kinematic two-drone simulator with a pinhole renderer (hermetic CI)."""

    def __init__(self, image_hw: Tuple[int, int] = (64, 96),
                 fov_deg: float = 90.0, seed: int = 0) -> None:
        self.drones: Dict[str, _Drone] = {"Drone1": _Drone(), "Drone2": _Drone()}
        self.h, self.w = image_hw
        self.focal = (self.w / 2) / math.tan(math.radians(fov_deg) / 2)
        self.time_s = 0.0
        self.paused = True
        self._rng = np.random.default_rng(seed)
        self._texture = self._rng.random((self.h * 2, self.w * 2)).astype(np.float32)

    # -- connection/infra ------------------------------------------------
    def confirm_connection(self) -> None:
        pass

    def set_segmentation_ids(self) -> None:
        pass

    def enable_api_control(self, enable: bool, vehicle: str) -> None:
        pass

    def arm_disarm(self, arm: bool, vehicle: str) -> None:
        self.drones[vehicle].armed = arm

    # -- state -----------------------------------------------------------
    def get_position(self, vehicle: str) -> Vector3:
        p = self.drones[vehicle].position
        return Vector3(float(p[0]), float(p[1]), float(p[2]))

    def get_yaw(self, vehicle: str) -> float:
        return self.drones[vehicle].yaw

    def is_landed(self, vehicle: str) -> bool:
        return self.drones[vehicle].landed

    def takeoff(self, vehicle: str) -> None:
        d = self.drones[vehicle]
        d.landed = False
        d.position = d.position + np.array([0.0, 0.0, -1.5])

    def set_pose(self, vehicle: str, position: Vector3, yaw: float) -> None:
        d = self.drones[vehicle]
        d.position = position.to_numpy().astype(float)
        d.yaw = yaw
        d.velocity = np.zeros(3)

    def move_to_position(self, vehicle: str, target: Vector3, speed: float) -> None:
        self.drones[vehicle].position = target.to_numpy().astype(float)

    def move_by_velocity_z(self, vehicle: str, vx: float, vy: float, z: float,
                           yaw_deg: Optional[float] = None,
                           yaw_rate: Optional[float] = None) -> None:
        d = self.drones[vehicle]
        d.velocity = np.array([vx, vy, 0.0])
        d.target_z = z
        d.landed = False
        if yaw_deg is not None:
            d.yaw = math.radians(yaw_deg)
            d.yaw_rate = 0.0
        if yaw_rate is not None:
            d.yaw_rate = math.radians(yaw_rate)

    def land(self, vehicle: str) -> None:
        d = self.drones[vehicle]
        d.landed = True
        d.velocity = np.zeros(3)

    def continue_for_time(self, seconds: float) -> None:
        steps = max(int(seconds / 0.05), 1)
        dt = seconds / steps
        for _ in range(steps):
            for d in self.drones.values():
                if d.landed:
                    continue
                d.position = d.position + d.velocity * dt
                if d.target_z is not None:
                    d.position[2] += (d.target_z - d.position[2]) * min(1.0, 2 * dt)
                d.yaw += d.yaw_rate * dt
        self.time_s += seconds

    def pause(self, paused: bool) -> None:
        self.paused = paused

    # -- rendering -------------------------------------------------------
    def _project(self, observer: _Drone, point: np.ndarray) -> Optional[Tuple[float, float, float]]:
        """World point -> (px, py, depth) in the observer's camera, or None."""
        rel = point - observer.position
        cy, sy = math.cos(-observer.yaw), math.sin(-observer.yaw)
        # camera looks along +x of the body frame; z down (NED-ish)
        fwd = rel[0] * cy - rel[1] * sy
        right = rel[0] * sy + rel[1] * cy
        up = -rel[2]
        if fwd <= 0.1:
            return None
        px = self.w / 2 + self.focal * right / fwd
        py = self.h / 2 - self.focal * up / fwd
        return px, py, fwd

    def capture(self, vehicle: str) -> List[ImageResponse]:
        obs = self.drones[vehicle]
        other_name = "Drone2" if vehicle == "Drone1" else "Drone1"
        target = self.drones[other_name]

        # textured background that shifts with observer yaw/position
        ys, xs = np.mgrid[0:self.h, 0:self.w]
        ox = int((obs.position[0] * 3 + obs.yaw * 40)) % self.w
        oy = int(obs.position[1] * 3) % self.h
        scene = self._texture[oy:oy + self.h, ox:ox + self.w].copy() * 160 + 40

        seg = np.zeros((self.h, self.w), np.uint8)
        depth = np.full((self.h, self.w), 80.0, np.float32)
        depth[self.h // 2:] = np.linspace(40, 8, self.h - self.h // 2)[:, None]

        proj = self._project(obs, target.position)
        if proj is not None:
            px, py, dist = proj
            r = max(2.0, 30.0 / max(dist, 0.5))
            mask = (xs - px) ** 2 + (ys - py) ** 2 <= r ** 2
            scene[mask] = 25.0
            seg[mask] = 255
            depth[mask] = dist

        scene_rgb = np.repeat(np.clip(scene, 0, 255)[..., None], 3, -1).astype(np.uint8)
        seg_rgb = np.repeat(seg[..., None], 3, -1)
        return [
            ImageResponse("segmentation", False, seg_rgb),
            ImageResponse("scene", False, scene_rgb),
            ImageResponse("depth", True, depth),
        ]

    def get_state(self, vehicle: str) -> Dict:
        d = self.drones[vehicle]
        half_yaw = d.yaw / 2
        return {
            "kinematics_estimated": {
                "position": {"x_val": d.position[0], "y_val": d.position[1],
                             "z_val": d.position[2]},
                "linear_velocity": {"x_val": d.velocity[0], "y_val": d.velocity[1],
                                    "z_val": d.velocity[2]},
            },
            "imu": {
                "time_stamp": self.sim_time_ns(),
                "orientation": {"x_val": 0.0, "y_val": 0.0,
                                "z_val": math.sin(half_yaw),
                                "w_val": math.cos(half_yaw)},
                "angular_velocity": {"x_val": 0.0, "y_val": 0.0, "z_val": d.yaw_rate},
            },
        }

    def sim_time_ns(self) -> int:
        return int(self.time_s * 1e9)
