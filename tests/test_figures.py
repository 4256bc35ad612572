"""Analysis/figure generator tests over the synthetic fixture."""
import os

import numpy as np
import pytest

from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams
from mav_detection_tpu.eval.figures import (
    expected_pixel_flow,
    foe_angular_error_map,
    foe_error_histograms,
    plot_states,
    radial_error_histogram,
    radial_error_model,
    remove_empty_segmentations,
    tpr_fpr_vs_flow,
)


@pytest.fixture(scope="module")
def ds():
    return SyntheticDataset(params=SyntheticParams(
        height=120, width=160, n_frames=8, expansion=0.035, foe=(95.0, 55.0)))


@pytest.fixture(scope="module")
def results_dir(tmp_path_factory, ds):
    """Generate real results via the pipeline once."""
    import jax

    from mav_detection_tpu.core.config import RunConfig
    from mav_detection_tpu.core.frame_result import FrameResult
    from mav_detection_tpu.pipeline.processor import Processor

    d = tmp_path_factory.mktemp("res")
    cfg = RunConfig(dataset="synthetic", mode="FLOW_FOE_CLUSTERING",
                    flow_source="GROUND_TRUTH", headless=True)
    cfg.get_dataset = lambda: SyntheticDataset(
        params=SyntheticParams(height=120, width=160, n_frames=8,
                               expansion=0.035, foe=(95.0, 55.0)),
        materialize_to=str(d))
    proc = Processor(cfg)
    proc.run_detection()
    return proc.dataset.results_path


class TestFigures:
    def test_foe_error_histograms(self, results_dir, tmp_path):
        stats = foe_error_histograms({"run": results_dir},
                                     out_dir=str(tmp_path / "out"))
        assert "run" in stats
        assert abs(stats["run"]["mean"][0]) < 10
        assert os.path.exists(tmp_path / "out" / "foe-error.png")

    def test_tpr_fpr_vs_flow(self, results_dir, tmp_path):
        out = tpr_fpr_vs_flow({"v1": results_dir}, out_dir=str(tmp_path / "o"))
        assert out["tpr"].shape == (1,)
        assert os.path.exists(tmp_path / "o" / "tpr_fpr_vs_flow.png")

    def test_tpr_surface_3d(self, results_dir, tmp_path):
        from mav_detection_tpu.eval.figures import tpr_surface_3d

        out = tpr_surface_3d({1.0: results_dir, 3.0: results_dir},
                             out_dir=str(tmp_path / "s"))
        assert out["tpr"].shape == (2, 40)
        assert (out["tpr"] >= 0).all() and (out["tpr"] <= 1).all()
        assert os.path.exists(tmp_path / "s" / "tpr_flow_vs_phi.png")
        assert os.path.exists(tmp_path / "s" / "tpr_flow_vs_phi.eps")

    def test_foe_error_published_comparison(self, results_dir, tmp_path):
        from mav_detection_tpu.eval.figures import (
            PUBLISHED_FOE_STATS,
            foe_error_published_comparison,
        )

        out = foe_error_published_comparison({"center": results_dir},
                                             out_dir=str(tmp_path / "p"))
        assert out["center"]["published"] == PUBLISHED_FOE_STATS["center"]
        assert abs(out["center"]["mean"][0]) < 15
        assert os.path.exists(tmp_path / "p" / "foe-error.png")
        assert os.path.exists(tmp_path / "p" / "foe-error.eps")

    def test_angular_error_map(self, ds, tmp_path):
        out = str(tmp_path / "map.png")
        avg = foe_angular_error_map(ds, n_frames=4, out_path=out)
        assert avg.shape == (120, 160)
        # GT flow + GT FoE (minus rotation contamination) -> small angles off-drone
        assert np.median(avg) < 25.0
        assert os.path.exists(out)

    def test_radial_error_histogram(self, ds, tmp_path):
        out = str(tmp_path / "rad.png")
        res = radial_error_histogram(ds, n_frames=3, out_path=out)
        assert res["mag"].size > 0
        assert os.path.exists(out)

    def test_radial_model_shape(self):
        hi, lo = radial_error_model(np.array([1.0, 8.0]))
        np.testing.assert_allclose(hi, [0.25 + 8.5, 0.25 + 1.5])
        np.testing.assert_allclose(lo, [0.25 - 8.5, 0.25 - 1.5])

    def test_plot_states(self, ds, tmp_path):
        out = str(tmp_path / "states.png")
        plot_states(ds, out_path=out)
        assert os.path.exists(out)


class TestTools:
    def test_remove_empty_segmentations(self, tmp_path):
        from mav_detection_tpu.data.dataset import imwrite

        seg = tmp_path / "segs"
        seg.mkdir()
        imwrite(str(seg / "image_00000.png"), np.zeros((8, 8, 3), np.uint8))
        full = np.zeros((8, 8, 3), np.uint8)
        full[2:4] = 255
        imwrite(str(seg / "image_00001.png"), full)
        removed = remove_empty_segmentations(str(seg))
        assert removed == 1
        assert not os.path.exists(seg / "image_00000.png")
        assert os.path.exists(seg / "image_00001.png")

    def test_expected_pixel_flow(self):
        # 10 m/s target at 100 m, 90-degree FoV, 1000 px wide, 30 fps:
        # focal = 500 px, angular rate 0.1 rad/s -> 50/30 px/frame
        v = expected_pixel_flow(10.0, 100.0, 90.0, 1000, 30.0)
        assert v == pytest.approx(500 * 0.1 / 30.0, rel=1e-6)


class TestValidatorClient:
    def test_parse_frames_box_strings(self):
        from mav_detection_tpu.eval.validator import Validator

        frames = {"0": ["drone 0.9 10 20 30 40", "bird 0.4 1 2 3 4"], "3": []}
        parsed = Validator.parse_frames(frames)
        assert set(parsed.keys()) == {0, 3}
        name, conf, rect = parsed[0][0]
        assert name == "drone" and conf == 0.9
        assert rect.get_topleft() == (10.0, 20.0)
        assert rect.size == (30.0, 40.0)
        assert parsed[3] == []

    def test_hash_cache_roundtrip(self, tmp_path):
        from mav_detection_tpu.core.config import RunConfig
        from mav_detection_tpu.eval.validator import Validator

        v = Validator(RunConfig(dataset="synthetic"))
        f = tmp_path / "video.bin"
        f.write_bytes(b"some video bytes")
        digest = v.get_hash(str(f))
        assert len(digest) == 40  # sha1 hex
        cache, path = v.check_cache(digest, str(tmp_path / "boxes"))
        assert cache is None
        import json

        with open(path, "w") as fh:
            json.dump({"0": ["drone 0.9 1 2 3 4"]}, fh)
        cache2, _ = v.check_cache(digest, str(tmp_path / "boxes"))
        assert cache2 == {"0": ["drone 0.9 1 2 3 4"]}


class TestRunAllSweep:
    @pytest.mark.slow
    def test_run_all_over_synthetic_sequences(self, tmp_path, monkeypatch):
        import argparse

        from mav_detection_tpu.cli.main import run_all, get_logger

        monkeypatch.chdir(tmp_path)
        monkeypatch.setenv("SYNTHETIC_PATH", str(tmp_path / "data"))
        (tmp_path / "settings.json").write_text(
            '{"validation_sequences": ["synthetic/sweep-a"],'
            ' "train_sequences": [], "yolo_train_weights": {}}')
        args = argparse.Namespace(dataset="synthetic", headless=True,
                                  flow_source="GROUND_TRUTH", batch_size=4,
                                  devices=0, num_hosts=0, host_index=None)
        run_all(get_logger(False), args)
        assert (tmp_path / "data" / "synthetic" / "sweep-a" / "results").exists()

    def test_run_all_multihost_sharding(self, tmp_path, monkeypatch):
        """Each host takes sequences[i::n]; disjoint cover, no tensor traffic."""
        import argparse

        from mav_detection_tpu.cli import main as cli_main

        monkeypatch.chdir(tmp_path)
        (tmp_path / "settings.json").write_text(
            '{"validation_sequences": ["s0", "s1", "s2", "s3", "s4"],'
            ' "train_sequences": [], "yolo_train_weights": {}}')
        seen = []
        monkeypatch.setattr(cli_main, "execute",
                            lambda cfg: seen.append(cfg.sequence))
        for host in range(2):
            args = argparse.Namespace(dataset="synthetic", headless=True,
                                      flow_source="GROUND_TRUTH",
                                      batch_size=4, devices=0,
                                      num_hosts=2, host_index=host)
            cli_main.run_all(cli_main.get_logger(False), args)
        assert sorted(seen) == ["s0", "s1", "s2", "s3", "s4"]
        assert seen == ["s0", "s2", "s4", "s1", "s3"]
