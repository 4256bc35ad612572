"""Core layer parity tests: Rectangle/IoU, .flo IO, FrameResult JSON schema."""
import json
import os

import numpy as np
import pytest

from mav_detection_tpu.core import Rectangle, read_flow, write_flow, FrameResult
from mav_detection_tpu.core.rectangle import parse_yolo_annotation
from mav_detection_tpu.core.config import Mode, DatasetType, Algorithm, RunConfig


class TestRectangle:
    def test_yolo_roundtrip(self):
        img_size = np.array([752, 480])
        r = Rectangle.from_center((100.0, 200.0), (50.0, 30.0))
        line = r.to_yolo(img_size)
        values = [float(x) for x in line.split(" ")]
        r2 = Rectangle.from_yolo_input(values, img_size)
        assert np.allclose(r2.topleft, r.topleft)
        assert np.allclose(r2.size, r.size)

    def test_iou_identical(self):
        r = Rectangle((10, 10), (20, 20))
        assert Rectangle.calculate_iou(r, r) == pytest.approx(1.0)

    def test_iou_half_overlap(self):
        r1 = Rectangle((0, 0), (10, 10))
        r2 = Rectangle((5, 0), (10, 10))
        # overlap 50, union 150
        assert Rectangle.calculate_iou(r1, r2) == pytest.approx(50 / 150)

    def test_area_floor(self):
        r = Rectangle((0, 0), (0.5, 0.5))
        assert r.get_area() == 1.0

    def test_iou_disjoint_reference_defect_preserved(self):
        """calculate_iou keeps the reference's disjoint-box defect
        (utils.py:86-104: both edge deltas negative -> bogus positive
        intersection); calculate_iou_safe returns the true 0."""
        # barely disjoint: deltas -2 x -2 -> bogus +4 intersection, IoU > 0
        r1 = Rectangle((0, 0), (10, 10))
        r2 = Rectangle((12, 12), (10, 10))
        assert Rectangle.calculate_iou(r1, r2) == pytest.approx(4 / 196)
        assert Rectangle.calculate_iou_safe(r1, r2) == 0.0
        # far apart: bogus intersection exceeds the areas, union flips
        # negative -> nonsense negative IoU (still the reference's math)
        r3 = Rectangle((50, 50), (10, 10))
        assert Rectangle.calculate_iou(r1, r3) < 0
        assert Rectangle.calculate_iou_safe(r1, r3) == 0.0

    def test_iou_safe_matches_iou_when_overlapping(self):
        r1 = Rectangle((0, 0), (10, 10))
        r2 = Rectangle((5, 0), (10, 10))
        assert Rectangle.calculate_iou_safe(r1, r2) == pytest.approx(
            Rectangle.calculate_iou(r1, r2))
        r = Rectangle((10, 10), (20, 20))
        assert Rectangle.calculate_iou_safe(r, r) == pytest.approx(1.0)

    def test_accessors(self):
        r = Rectangle((3, 4), (10, 20))
        assert r.get_bottomright() == (13, 24)
        assert r.get_center() == (8, 14)
        assert r.get_center_int() == (8, 14)

    def test_parse_annotation_file(self, tmp_path):
        img_size = np.array([100, 100])
        p = tmp_path / "image_00000.txt"
        p.write_text("0 0.5 0.5 0.2 0.2\n0 0.1 0.1 0.001 0.001\n")
        rects = parse_yolo_annotation(str(p), img_size)
        # degenerate (area <= 1) box dropped, like the reference
        assert len(rects) == 1
        assert rects[0].get_center() == (50.0, 50.0)


class TestFloIO:
    def test_roundtrip(self, tmp_path, rng):
        flow = rng.normal(size=(48, 64, 2)).astype(np.float32)
        path = str(tmp_path / "test.flo")
        write_flow(path, flow)
        back = read_flow(path)
        np.testing.assert_array_equal(back, flow)

    def test_reference_compatible_layout(self, tmp_path):
        """Byte layout must match the reference writer exactly."""
        flow = np.zeros((2, 3, 2), np.float32)
        flow[0, 0] = (1.5, -2.5)
        flow[1, 2] = (7.0, 8.0)
        path = str(tmp_path / "layout.flo")
        write_flow(path, flow)
        raw = open(path, "rb").read()
        assert np.frombuffer(raw[:4], np.float32)[0] == np.float32(202021.25)
        assert np.frombuffer(raw[4:8], np.int32)[0] == 3  # width
        assert np.frombuffer(raw[8:12], np.int32)[0] == 2  # height
        data = np.frombuffer(raw[12:], np.float32).reshape(2, 3, 2)
        np.testing.assert_array_equal(data, flow)

    def test_bad_magic_raises(self, tmp_path):
        path = str(tmp_path / "bad.flo")
        with open(path, "wb") as f:
            np.array([1.0], np.float32).tofile(f)
            np.array([1, 1], np.int32).tofile(f)
            np.zeros(2, np.float32).tofile(f)
        with pytest.raises(ValueError):
            read_flow(path)

    def test_cv2_oracle_read(self, tmp_path, rng):
        """Our .flo files must be readable by OpenCV's reader and vice versa."""
        cv2 = pytest.importorskip("cv2")
        flow = rng.normal(size=(20, 30, 2)).astype(np.float32)
        path = str(tmp_path / "x.flo")
        write_flow(path, flow)
        back = cv2.readOpticalFlow(path)
        np.testing.assert_allclose(back, flow)


class TestFrameResult:
    def test_json_schema_matches_reference(self, tmp_path):
        fr = FrameResult()
        fr.tpr = 0.5
        fr.foe_dense = (12.0, 34.0)
        d = json.loads(fr.to_json())
        # exact key set of /root/reference/src/frame_result.py:4-17
        assert set(d.keys()) == {
            "time", "tpr", "fpr", "tpr_fixed", "fpr_fixed", "sky_tpr",
            "sky_fpr", "drone_size_pixels", "drone_flow_pixels", "foe_dense",
            "foe_gt", "center_phi",
        }
        path = tmp_path / "image_00000.json"
        path.write_text(fr.to_json())
        back = FrameResult.from_json_file(str(path))
        assert back.tpr == 0.5
        assert back.foe_dense == (12.0, 34.0)

    def test_numpy_scalars_serializable(self):
        fr = FrameResult()
        fr.tpr = np.float32(0.25)
        fr.drone_size_pixels = np.int64(42)
        d = json.loads(fr.to_json())
        assert d["tpr"] == 0.25
        assert d["drone_size_pixels"] == 42


class TestRunConfig:
    def test_mode_parsing(self):
        cfg = RunConfig(mode="FLOW_FOE_CLUSTERING")
        assert cfg.mode == Mode.FLOW_FOE_CLUSTERING
        assert not cfg.uses_nn_for_detection()

    def test_nn_modes(self):
        for m in ("FLOW_UV", "FLOW_RADIAL", "FLOW_FOE_YOLO"):
            assert RunConfig(mode=m).uses_nn_for_detection()

    def test_invalid_mode_raises(self):
        with pytest.raises(ValueError):
            RunConfig(mode="NOT_A_MODE")

    def test_dataset_type(self):
        assert RunConfig(dataset="midgard").get_dataset_type() == DatasetType.MIDGARD
        assert RunConfig(dataset="synthetic").get_dataset_type() == DatasetType.SYNTHETIC
