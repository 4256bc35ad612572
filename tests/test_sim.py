"""Simulation-suite tests: config grid, geometry, mock choreography e2e."""
import glob
import json
import os

import numpy as np
import pytest

from mav_detection_tpu.sim import (
    FlightMode,
    MockSimClient,
    Orientation,
    SimConfig,
    SimDataCollector,
    Vector3,
)


COLLECTION = {
    "orientations": ["north"],
    "locations": {"testfield": {"x": 0.0, "y": 0.0, "z": -2.0}},
    "orbit_speed": [2.0],
    "global_speed": {"default": {"lin_x": 2.0, "sin_y": 0.0, "sin_z": 0.0}},
    "heights": {"low": 3.0},
    "radii": [10.0],
    "modes": ["foe_demo"],
    "collision_angles": [10.0],
}


class TestSimConfig:
    def test_orientation_headings(self):
        assert Orientation.NORTH.heading_deg() == 0
        assert Orientation.WEST.heading_deg() == 270
        assert SimConfig.get_orientation("east") == Orientation.EAST

    def test_invalid_mode_raises(self):
        with pytest.raises(ValueError):
            SimConfig.get_mode("SPIRAL")

    def test_directory_naming(self):
        cfg = SimConfig("field", "low", Vector3(0, 0, -5), Orientation.NORTH,
                        10.0, -2.0, 2.0, Vector3(2, 0, 0), "default",
                        FlightMode.ORBIT, 10.0)
        assert str(cfg) == "field-orbit-10.0-north-low-10.0-2.0-default"

    def test_start_positions(self):
        cfg = SimConfig("f", "low", Vector3(0, 0, -5), Orientation.NORTH,
                        10.0, -2.0, 2.0, Vector3(2, 0, 0), "d",
                        FlightMode.ORBIT, 0.0)
        obs = cfg.get_start_position(True)
        tgt = cfg.get_start_position(False)
        assert obs.to_numpy().tolist() == [0, 0, -5]
        # target on the orbit circle at heading-70 degrees
        assert abs(tgt.get_length() - np.hypot(10.0, 5.0)) < 1e-6

    def test_collision_start_positions_opposite(self):
        cfg = SimConfig("f", "low", Vector3(0, 0, -5), Orientation.NORTH,
                        10.0, -2.0, 2.0, Vector3(2, 0, 0), "d",
                        FlightMode.COLLISION, 0.0)
        obs = cfg.get_start_position(True).to_numpy()
        tgt = cfg.get_start_position(False).to_numpy()
        # 180-degree separation -> opposite x signs, ~2R apart
        assert np.linalg.norm(obs - tgt) == pytest.approx(20.0, rel=1e-6)


class TestMockClient:
    def test_kinematics_integrate(self):
        c = MockSimClient()
        c.set_pose("Drone1", Vector3(0, 0, -3), 0.0)
        c.move_by_velocity_z("Drone1", 2.0, 0.0, -3.0)
        c.continue_for_time(1.0)
        p = c.get_position("Drone1")
        assert p.x_val == pytest.approx(2.0, abs=1e-6)

    def test_render_target_visible(self):
        c = MockSimClient()
        c.set_pose("Drone1", Vector3(0, 0, -3), 0.0)
        c.set_pose("Drone2", Vector3(8, 0, -3), 0.0)  # ahead of camera
        c.drones["Drone1"].landed = False
        c.drones["Drone2"].landed = False
        responses = c.capture("Drone1")
        seg = [r for r in responses if r.image_type == "segmentation"][0]
        assert seg.data.sum() > 0  # target rendered
        depth = [r for r in responses if r.image_type == "depth"][0]
        assert depth.pixels_as_float

    def test_target_behind_camera_invisible(self):
        c = MockSimClient()
        c.set_pose("Drone1", Vector3(0, 0, -3), 0.0)
        c.set_pose("Drone2", Vector3(-8, 0, -3), 0.0)  # behind
        assert c.capture("Drone1")[0].data.sum() == 0


class TestCollectorEndToEnd:
    def test_foe_demo_collection(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        client = MockSimClient()
        collector = SimDataCollector(client, COLLECTION,
                                     root_data_dir=str(tmp_path / "data"),
                                     max_iterations=6)
        assert len(collector.configs) == 1
        collector.run()

        seq_dir = collector.get_base_dir(collector.configs[0])
        imgs = sorted(glob.glob(f"{seq_dir}/images/image_*.png"))
        states = sorted(glob.glob(f"{seq_dir}/states/*.json"))
        states = [s for s in states if "timestamps" not in s]
        assert len(imgs) == 6  # foe_demo keeps every frame
        assert len(states) == 6
        d = json.load(open(states[0]))
        assert "Drone1" in d and "imu" in d["Drone1"]
        assert os.path.exists(f"{seq_dir}/states/timestamps.json")
        assert sorted(glob.glob(f"{seq_dir}/depths/image_*.pfm"))

    def test_grid_skips_existing(self, tmp_path):
        client = MockSimClient()
        c1 = SimDataCollector(client, COLLECTION, root_data_dir=str(tmp_path / "d"))
        os.makedirs(c1.get_base_dir(c1.configs[0]))
        c2 = SimDataCollector(client, COLLECTION, root_data_dir=str(tmp_path / "d"))
        assert len(c2.configs) == 0  # idempotent resume

    def test_ue4_timestamp_join(self, tmp_path):
        client = MockSimClient()
        collector = SimDataCollector(client, COLLECTION,
                                     root_data_dir=str(tmp_path / "data"),
                                     max_iterations=3)
        # fake engine-side dumps
        for ts in (0, 1000, 2000, 3000):
            with open(tmp_path / "data" / "states" / f"{ts}.json", "w") as f:
                json.dump({"Drone1": {"FoE": {"X": 0.5, "Y": 0.5}},
                           "Drone2": {"linearVelocity": {"X": 1, "Y": 0, "Z": 0}}}, f)
        collector.run()
        seq_dir = collector.get_base_dir(collector.configs[0])
        states = [s for s in sorted(glob.glob(f"{seq_dir}/states/*.json"))
                  if "timestamps" not in s]
        d = json.load(open(states[0]))
        assert "ue4" in d["Drone1"]
        assert "thread_difference" in d


class TestRenormalizeIndices:
    def test_gapped_captures_repack_consecutively(self, tmp_path):
        """Orbit-mode visibility drops leave index gaps; finish_sequence
        repacks artifacts so the GT-flow writer's consecutive image_%05d
        reads (data/airsim_flow.py) line up with the state order."""
        client = MockSimClient()
        collector = SimDataCollector(client, COLLECTION,
                                     root_data_dir=str(tmp_path / "d"),
                                     max_iterations=1)
        collector.base_dir = str(tmp_path / "d" / "seq")
        for sub, ext in (("images", "png"), ("segmentations", "png"),
                         ("depths", "pfm")):
            os.makedirs(f"{collector.base_dir}/{sub}")
            for i in (3, 11, 12, 40):
                with open(f"{collector.base_dir}/{sub}/image_{i:05d}.{ext}",
                          "w") as f:
                    f.write(str(i))
        collector.renormalize_indices()
        for sub, ext in (("images", "png"), ("segmentations", "png"),
                         ("depths", "pfm")):
            names = sorted(os.listdir(f"{collector.base_dir}/{sub}"))
            assert names == [f"image_{k:05d}.{ext}" for k in range(4)]
            # order preserved: smallest old index -> slot 0
            with open(f"{collector.base_dir}/{sub}/image_00000.{ext}") as f:
                assert f.read() == "3"


class TestCollectCLI:
    def test_mock_collection_from_command_line(self, tmp_path, monkeypatch):
        """The reference's acquisition tool is a CLI
        (airsim-control.py:618-627); ours flies a settings.json collection
        hermetically with --mock and writes the full sequence layout."""
        from mav_detection_tpu.sim.control import main

        monkeypatch.chdir(tmp_path)
        with open(tmp_path / "settings.json", "w") as f:
            json.dump({"collections": {"tiny": COLLECTION}}, f)
        main(["--collection", "tiny", "--mock",
              "--data-dir", str(tmp_path / "data"), "--max-iterations", "4"])
        seqs = [d for d in glob.glob(str(tmp_path / "data" / "*"))
                if os.path.isdir(d) and "testfield" in d]
        assert len(seqs) == 1
        for sub in ("images", "states", "segmentations", "depths"):
            assert os.path.isdir(os.path.join(seqs[0], sub)), sub
        assert glob.glob(os.path.join(seqs[0], "images", "*.png"))

    def test_unknown_collection_exits(self, tmp_path, monkeypatch):
        from mav_detection_tpu.sim.control import main

        monkeypatch.chdir(tmp_path)
        with open(tmp_path / "settings.json", "w") as f:
            json.dump({"collections": {}}, f)
        with pytest.raises(SystemExit):
            main(["--collection", "nope", "--mock"])
