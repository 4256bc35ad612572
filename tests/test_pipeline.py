"""End-to-end pipeline + data-layer integration tests."""
import glob
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mav_detection_tpu.core.config import Mode, RunConfig
from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams
from mav_detection_tpu.pipeline.detector import DetectionStep, detect_frame_pair, detect_frame_batch
from mav_detection_tpu.pipeline.processor import Processor


# expansion raised so background flow clears the reference's 2.5 px FoE
# sampling gate at this small resolution
SMALL = SyntheticParams(height=120, width=160, n_frames=8, expansion=0.035,
                        foe=(95.0, 55.0), drone_start=(30.0, 30.0),
                        drone_radius=6)


@pytest.fixture(scope="module")
def synthetic():
    return SyntheticDataset(params=SMALL)


class TestSyntheticDataset:
    def test_shapes_and_contract(self, synthetic):
        ds = synthetic
        assert ds.N == 8
        assert ds.get_frame(0).shape == (120, 160, 3)
        assert ds.get_flow_uv(0).shape == (120, 160, 2)
        assert ds.get_gt_foe(0) == (95.0, 55.0)
        assert ds.get_segmentation(0).shape == (120, 160, 3)
        assert ds.get_depth(0).shape == (120, 160)
        ann = ds.get_annotation(2)
        assert len(ann) == 1

    def test_frames_consistent_with_gt_flow(self, synthetic):
        """Farneback on the rendered frames must approximate the GT flow —
        this validates the renderer/flow consistency, not just the API."""
        from mav_detection_tpu.ops.flow import FarnebackParams, farneback_flow
        from mav_detection_tpu.ops.image.color import bgr_to_gray

        ds = synthetic
        g0 = bgr_to_gray(jnp.asarray(ds.get_frame(0))).astype(jnp.float32)
        g1 = bgr_to_gray(jnp.asarray(ds.get_frame(1))).astype(jnp.float32)
        est = np.asarray(farneback_flow(g0, g1, FarnebackParams(0.5, 2, 13, 10, 5, 1.1)))
        gt = ds.get_flow_uv(0)
        inner = (slice(15, -15), slice(15, -15))
        epe = np.linalg.norm(est - gt, axis=-1)[inner]
        # background flow is sub-pixel here; Farneback should land close
        assert np.median(epe) < 0.3

    def test_sky_excludes_drone(self, synthetic):
        ds = synthetic
        seg = ds.get_segmentation(0)[..., 0] > 127
        sky = ds.get_sky_segmentation(0)
        assert not (seg & sky).any()

    def test_materialize_roundtrip(self, tmp_path):
        ds = SyntheticDataset(params=SMALL)
        seq = ds.materialize(str(tmp_path))
        assert os.path.exists(os.path.join(seq, "images", "image_00000.png"))
        assert os.path.exists(os.path.join(seq, "optical-flow", "image_00000.flo"))
        from mav_detection_tpu.core.flo import read_flow

        back = read_flow(os.path.join(seq, "optical-flow", "image_00000.flo"))
        np.testing.assert_allclose(back, ds.get_flow_uv(0), atol=1e-6)
        # the generic Dataset class can open the materialized sequence
        from mav_detection_tpu.data.dataset import Dataset

        class _Local(Dataset):
            def get_default_sequence(self):
                return ds.sequence

        loaded = _Local(str(tmp_path), None, ds.sequence)
        assert loaded.N == ds.N
        np.testing.assert_array_equal(loaded.get_frame(0)[..., 0],
                                      ds.get_frame(0)[..., 0])


class TestDetectionStep:
    def test_detects_synthetic_intruder(self, synthetic):
        ds = synthetic
        i = 2
        out = detect_frame_pair(
            jnp.asarray(ds.get_flow_uv(i)),
            jnp.asarray(ds.get_gt_of(i)),
            jnp.asarray(ds.get_angular_difference(i, i + 1) / ds.get_delta_time(i + 1),
                        jnp.float32),
            jnp.asarray(ds.get_delta_time(i + 1), jnp.float32),
            jnp.asarray(ds.get_segmentation(i)[..., 0]),
            jnp.asarray(ds.get_sky_segmentation(i)),
            jnp.asarray(ds.get_depth(i)),
            jnp.asarray(ds.get_gt_foe(i), jnp.float32),
            jax.random.PRNGKey(0),
            config=DetectionStep(foe_samples=500),
        )
        assert float(out.tpr_fixed) > 0.9
        assert float(out.fpr_fixed) < 0.05
        foe_err = np.linalg.norm(np.asarray(out.foe) - np.asarray(ds.get_gt_foe(i)))
        assert foe_err < 5.0

    def test_batch_matches_single(self, synthetic):
        ds = synthetic
        idx = [1, 2]
        flow = jnp.asarray(np.stack([ds.get_flow_uv(i) for i in idx]))
        gt = flow
        omega = jnp.asarray(np.stack([
            ds.get_angular_difference(i, i + 1) / ds.get_delta_time(i + 1)
            for i in idx]), jnp.float32)
        dt = jnp.full((2,), ds.get_delta_time(1), jnp.float32)
        seg = jnp.asarray(np.stack([ds.get_segmentation(i)[..., 0] for i in idx]))
        sky = jnp.asarray(np.stack([ds.get_sky_segmentation(i) for i in idx]))
        depth = jnp.asarray(np.stack([ds.get_depth(i) for i in idx]), jnp.float32)
        foe_gt = jnp.asarray(np.stack([ds.get_gt_foe(i) for i in idx]), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(1), 2)

        batch = detect_frame_batch(flow, gt, omega, dt, seg, sky, depth,
                                   foe_gt, keys, config=DetectionStep(foe_samples=300))
        single0 = detect_frame_pair(flow[0], gt[0], omega[0], dt[0], seg[0],
                                    sky[0], depth[0], foe_gt[0], keys[0],
                                    config=DetectionStep(foe_samples=300))
        np.testing.assert_allclose(np.asarray(batch.foe[0]),
                                   np.asarray(single0.foe), atol=1e-4)
        np.testing.assert_allclose(float(batch.tpr[0]), float(single0.tpr), atol=1e-6)

    @pytest.mark.slow
    def test_map_batch_mode_matches_vmap(self, synthetic):
        """batch_mode='map' (the single-device product default) must agree
        with the vmapped path used under a GSPMD mesh."""
        from mav_detection_tpu.pipeline.detector import detect_frame_batch_scalars

        ds = synthetic
        idx = [1, 2, 3]
        flow = jnp.asarray(np.stack([ds.get_flow_uv(i) for i in idx]))
        omega = jnp.asarray(np.stack([
            ds.get_angular_difference(i, i + 1) / ds.get_delta_time(i + 1)
            for i in idx]), jnp.float32)
        dt = jnp.full((3,), ds.get_delta_time(1), jnp.float32)
        seg = jnp.asarray(np.stack([ds.get_segmentation(i)[..., 0] for i in idx]))
        sky = jnp.asarray(np.stack([ds.get_sky_segmentation(i) for i in idx]))
        depth = jnp.asarray(np.stack([ds.get_depth(i) for i in idx]), jnp.float32)
        foe_gt = jnp.asarray(np.stack([ds.get_gt_foe(i) for i in idx]), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(7), 3)
        args = (flow, flow, omega, dt, seg, sky, depth, foe_gt, keys)

        for fn in (detect_frame_batch, detect_frame_batch_scalars):
            v = fn(*args, config=DetectionStep(foe_samples=300))
            m = fn(*args, config=DetectionStep(foe_samples=300,
                                               batch_mode="map"))
            assert type(v) is type(m)
            for name, a, b in zip(v._fields, v, m):
                a, b = np.asarray(a), np.asarray(b)
                if a.dtype == bool:
                    # threshold masks may flip on pixels sitting exactly at
                    # the decision boundary under fp reassociation
                    assert np.mean(a != b) < 5e-3, \
                        f"{fn.__name__}.{name} map != vmap"
                else:
                    # phi's arccos amplifies ~1e-7 dot-product
                    # reassociation noise to ~0.04 deg near phi=0
                    np.testing.assert_allclose(
                        a, b, atol=0.05,
                        err_msg=f"{fn.__name__}.{name} map != vmap")


class TestProcessorEndToEnd:
    def test_run_detection_and_validation(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SYNTHETIC_PATH", str(tmp_path))
        monkeypatch.chdir(tmp_path)
        cfg = RunConfig(dataset="synthetic", mode="FLOW_FOE_CLUSTERING",
                        flow_source="GROUND_TRUTH", headless=True, batch_size=4)
        proc = Processor(cfg)
        results = proc.run_detection()
        assert len(results) == SyntheticParams().n_frames - 1 or len(results) > 0

        # reference-schema JSONs on disk
        files = sorted(glob.glob(str(tmp_path / "synthetic" / "forward-flight"
                                     / "results" / "*.json")))
        assert files
        d = json.load(open(files[0]))
        assert "foe_dense" in d and "tpr_fixed" in d

        # detection quality on the fixture
        tprs = [r.tpr_fixed for r in results.values()]
        assert np.mean(tprs) > 0.9

        # validator consumes the artifacts
        from mav_detection_tpu.eval.validator import Validator

        stats = Validator(cfg).run_validation()
        assert stats["foe_mean"] is not None
        assert abs(stats["foe_mean"][0]) < 5.0
        seq = str(tmp_path / "synthetic" / "forward-flight")
        assert os.path.exists(os.path.join(seq, "validation.npy"))
        assert os.path.exists(os.path.join(seq, "roc.png"))


class TestParallel:
    def test_sharded_matches_unsharded(self, synthetic):
        from mav_detection_tpu.parallel import detect_frames_sharded, make_mesh

        ds = synthetic
        n = 8  # = device count
        i0 = 0
        flow = jnp.asarray(np.stack([ds.get_flow_uv(min(i0 + j, ds.N - 2))
                                     for j in range(n)]))
        omega = jnp.zeros((n, 3), jnp.float32)
        dt = jnp.full((n,), 0.05, jnp.float32)
        seg = jnp.asarray(np.stack([ds.get_segmentation(min(i0 + j, ds.N - 2))[..., 0]
                                    for j in range(n)]))
        sky = jnp.zeros((n,) + ds.get_depth(0).shape, bool)
        depth = jnp.asarray(np.stack([ds.get_depth(0)] * n), jnp.float32)
        foe_gt = jnp.tile(jnp.asarray([[95.0, 55.0]], jnp.float32), (n, 1))
        keys = jax.random.split(jax.random.PRNGKey(3), n)

        cfg = DetectionStep(foe_samples=200)
        mesh = make_mesh()
        assert mesh.devices.size == 8  # conftest forces 8 virtual devices
        sharded = detect_frames_sharded(mesh, flow, flow, omega, dt, seg, sky,
                                        depth, foe_gt, keys, config=cfg)
        plain = detect_frame_batch(flow, flow, omega, dt, seg, sky, depth,
                                   foe_gt, keys, config=cfg)
        np.testing.assert_allclose(np.asarray(sharded.foe),
                                   np.asarray(plain.foe), atol=1e-4)
        np.testing.assert_allclose(np.asarray(sharded.tpr_fixed),
                                   np.asarray(plain.tpr_fixed), atol=1e-6)

    def test_psum_metrics_match_host(self):
        from mav_detection_tpu.parallel import aggregate_metrics_psum, make_mesh

        rng = np.random.default_rng(0)
        seg = (rng.random((8, 32, 32)) > 0.9).astype(np.uint8) * 255
        est = (rng.random((8, 32, 32)) > 0.8).astype(np.uint8) * 255
        mesh = make_mesh()
        tpr, fpr = aggregate_metrics_psum(mesh, jnp.asarray(seg), jnp.asarray(est))
        gt = seg.astype(np.int64)
        e = est.astype(np.int64)
        ref_tpr = ((gt * e) > 127).sum() / (gt > 127).sum()
        ref_fpr = (((255 - gt) * e) > 127).sum() / ((255 - gt) > 127).sum()
        assert float(tpr) == pytest.approx(ref_tpr, rel=1e-5)
        assert float(fpr) == pytest.approx(ref_fpr, rel=1e-5)


class TestGraftEntry:
    @pytest.mark.slow
    def test_entry_compiles_and_runs(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__

        fn, args = __graft_entry__.entry()
        out = jax.jit(fn)(*args)
        foe = np.asarray(out[0])
        assert foe.shape == (2,) and np.isfinite(foe).all()

    @pytest.mark.slow
    def test_dryrun_multichip(self):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)


class TestFoeSamplesPlumbing:
    def test_cli_budget_reaches_detection_step(self):
        """--foe-samples flows RunConfig -> Processor -> DetectionStep (the
        budget is a static jit arg, so a silent plumbing break would quietly
        revert every run to the default vote)."""
        from mav_detection_tpu.data.synthetic import SyntheticDataset
        from mav_detection_tpu.pipeline.processor import Processor

        cfg = RunConfig(dataset="synthetic", mode="FLOW_FOE_CLUSTERING",
                        foe_samples=2000, headless=True)
        cfg.get_dataset = lambda: SyntheticDataset(params=SMALL)
        proc = Processor(cfg)
        assert proc._detection_step().foe_samples == 2000

    def test_default_matches_reference_budget(self):
        from mav_detection_tpu.ops.geometry.foe import NUM_SAMPLES
        from mav_detection_tpu.pipeline.detector import DetectionStep

        assert RunConfig(dataset="synthetic").foe_samples == NUM_SAMPLES == \
            DetectionStep().foe_samples == 1000


class TestHomographyBranch:
    def test_homography_detection_runs(self, tmp_path, monkeypatch):
        from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams

        monkeypatch.chdir(tmp_path)
        cfg = RunConfig(dataset="synthetic", mode="FLOW_FOE_CLUSTERING",
                        algorithm="HOMOGRAPHY", flow_source="GROUND_TRUTH",
                        headless=True)
        cfg.get_dataset = lambda: SyntheticDataset(
            params=SMALL, materialize_to=str(tmp_path))
        proc = Processor(cfg)
        results = proc.run_detection()
        assert len(results) == SMALL.n_frames - 1
        # mosaic artifacts written (frame | global motion | residual)
        import glob as _glob

        mosaics = _glob.glob(str(tmp_path / "synthetic" / "forward-flight"
                                 / "processed" / "*.png"))
        assert len(mosaics) == SMALL.n_frames - 1

    @pytest.mark.slow
    def test_homography_sparse_of(self, tmp_path, monkeypatch):
        """--use-sparse-of: LK feature tracks replace the sampled-flow
        correspondences (reference detector.py:130-136) and the branch still
        produces a FrameResult per pair."""
        from mav_detection_tpu.data.synthetic import SyntheticDataset, SyntheticParams

        monkeypatch.chdir(tmp_path)
        cfg = RunConfig(dataset="synthetic", mode="FLOW_FOE_CLUSTERING",
                        algorithm="HOMOGRAPHY", flow_source="GROUND_TRUTH",
                        use_sparse_of=True, headless=True)
        cfg.get_dataset = lambda: SyntheticDataset(
            params=SMALL, materialize_to=str(tmp_path))
        proc = Processor(cfg)
        results = proc.run_detection()
        assert len(results) == SMALL.n_frames - 1
        assert all(np.isfinite(fr.tpr) for fr in results.values())

    def test_sparse_correspondences_recover_translation(self, tmp_path,
                                                        monkeypatch):
        """On a rigidly translating textured frame the LK correspondences fit
        a homography whose motion field matches the true shift."""
        from mav_detection_tpu.ops.geometry import (
            fit_homography_lstsq,
            homography_motion_field,
        )

        rng = np.random.default_rng(3)
        base = rng.uniform(0, 255, (96, 128)).astype(np.float32)
        import scipy.ndimage as ndi

        tex = ndi.gaussian_filter(base, 2.0) * 4
        f0 = np.repeat(tex[..., None], 3, -1).astype(np.uint8)
        f1 = np.repeat(np.roll(tex, (2, 3), (0, 1))[..., None], 3,
                       -1).astype(np.uint8)

        class TwoFrames:
            def get_frame(self, i):
                return [f0, f1][i]

        cfg = RunConfig(dataset="synthetic", use_sparse_of=True,
                        algorithm="HOMOGRAPHY", headless=True)
        proc = Processor.__new__(Processor)
        proc.config = cfg
        proc.logger = cfg.logger
        grid = rng.uniform(20, 70, (200, 2)).astype(np.float32)
        # production fallback slots carry the measured flow; here that is
        # the known rigid shift
        p0, p1 = proc._sparse_correspondences(
            TwoFrames(), 0, grid, grid + np.float32([3.0, 2.0]))
        assert not np.allclose(p0, grid)  # corners actually replaced slots
        H = fit_homography_lstsq(jnp.asarray(p0), jnp.asarray(p1))
        gm = np.asarray(homography_motion_field(H, 96, 128))
        interior = gm[20:-20, 20:-20]
        np.testing.assert_allclose(interior[..., 0].mean(), 3.0, atol=0.3)
        np.testing.assert_allclose(interior[..., 1].mean(), 2.0, atol=0.3)


class TestSparseFoe:
    def test_sparse_foe_from_tracks(self):
        from mav_detection_tpu.ops.geometry import get_foe_sparse

        rng = np.random.default_rng(0)
        foe = np.array([80.0, 40.0])
        pts_new = rng.uniform(0, 120, (256, 2)).astype(np.float32)
        # expansion: new = old + 0.1 * (new - foe) => old = new - 0.1 (new - foe)
        pts_old = pts_new - 0.1 * (pts_new - foe)
        est = np.asarray(get_foe_sparse(jnp.asarray(pts_old),
                                        jnp.asarray(pts_new),
                                        jnp.ones(256, bool)))
        np.testing.assert_allclose(est, foe, atol=2.0)

    def test_sparse_foe_no_valid_tracks(self):
        from mav_detection_tpu.ops.geometry import get_foe_sparse

        pts = jnp.zeros((32, 2), jnp.float32)
        est = np.asarray(get_foe_sparse(pts, pts, jnp.zeros(32, bool)))
        np.testing.assert_array_equal(est, [0.0, 0.0])


class TestWarpDiff:
    def test_warp_diff_static_scene_zero(self):
        from mav_detection_tpu.ops.geometry.global_motion import warp_diff_method

        flow = jnp.ones((32, 48, 2), jnp.float32)
        ident = jnp.asarray(np.array([[1.0, 0, 0], [0, 1, 0]], np.float32))
        diff, mag = warp_diff_method(flow, ident)
        # identity warp: stable == flow -> diff == 0 everywhere inside
        assert float(jnp.abs(diff[1:-1, 1:-1]).max()) < 1e-5


class TestTailBatchPadding:
    def test_padded_tail_matches_unpadded(self, tmp_path, monkeypatch):
        """Tail-batch padding is a pure compile-count optimization: every
        FrameResult must be bit-identical with it on or off (7 pairs at
        batch_size=4 leaves a 3-frame tail that gets one pad lane)."""
        monkeypatch.setenv("SYNTHETIC_PATH", str(tmp_path))
        monkeypatch.chdir(tmp_path)

        def run(pad: bool):
            cfg = RunConfig(dataset="synthetic", mode="FLOW_FOE_CLUSTERING",
                            flow_source="GROUND_TRUTH", headless=True,
                            batch_size=4)
            proc = Processor(cfg)
            proc.pad_tail_batch = pad
            proc.save_images = False
            return proc.run_detection()

        ref, padded = run(False), run(True)
        assert set(ref) == set(padded)
        assert len(ref) % 4 != 0  # the fixture really exercises a tail
        for i in ref:
            a, b = ref[i], padded[i]
            assert a.foe_dense == b.foe_dense
            assert (a.tpr, a.fpr, a.tpr_fixed, a.fpr_fixed) == \
                (b.tpr, b.fpr, b.tpr_fixed, b.fpr_fixed)
            assert a.center_phi == b.center_phi


class TestConvertExport:
    def test_convert_uses_per_sequence_flow_and_mode_imagery(
            self, tmp_path, monkeypatch):
        """--prepare-dataset export (reference processor.py:209-237): images
        go through the shared mode transform and the flow comes from the
        sequence being exported (the reference re-creates its dataset per
        sequence, processor.py:142-155)."""
        import glob

        import cv2

        from mav_detection_tpu.pipeline.mode_imagery import mode_image_host
        from mav_detection_tpu.pipeline.processor import Processor

        # default params: convert re-creates the dataset per sequence via
        # the factory, which must regenerate the identical content
        ds = SyntheticDataset(materialize_to=str(tmp_path))
        monkeypatch.setenv("MIDGARD_PATH", str(tmp_path))
        monkeypatch.setenv("YOLOv4_PATH", str(tmp_path / "yolo"))
        monkeypatch.setenv("SYNTHETIC_PATH", str(tmp_path))

        cfg = RunConfig(dataset="synthetic", mode="FLOW_RADIAL",
                        flow_source="GROUND_TRUTH", headless=True)
        cfg.settings = {"train_sequences": [ds.sequence]}
        proc = Processor(cfg)
        proc.convert(Mode.FLOW_RADIAL)

        imgs = sorted(glob.glob(f"{tmp_path}/yolo/dataset/images/*.png"))
        anns = sorted(glob.glob(f"{tmp_path}/yolo/dataset/labels/yolo/*.txt"))
        assert len(imgs) == len(anns) == ds.N - 2  # last pair has no flow
        # first exported frame == the shared transform on that sequence's
        # own frame + GT flow (FLOW_RADIAL was unreachable in the reference)
        expected = mode_image_host(np.asarray(ds.get_frame(0)),
                                   np.asarray(ds.get_gt_of(0), np.float32),
                                   "FLOW_RADIAL", seed=0)
        got = cv2.imread(imgs[0])
        assert got is not None and got.shape == np.asarray(expected).shape
        np.testing.assert_array_equal(got, np.asarray(expected, np.uint8))


class TestRAFTVideoStaging:
    """Product RAFT path: contiguous staged batches share per-frame encoding
    (raft_flow_video) and must match the pair-batch path numerically."""

    @pytest.mark.slow
    def test_staged_video_matches_pair_batch(self, synthetic, tmp_path,
                                             monkeypatch):
        monkeypatch.setenv("SYNTHETIC_PATH", str(tmp_path))
        cfg = RunConfig(dataset="synthetic", mode="FLOW_FOE_CLUSTERING",
                        flow_source="RAFT", headless=True, batch_size=3)
        proc = Processor(cfg)
        proc.dataset = synthetic

        idx = [0, 1, 2]
        staged = proc._stage_batch(idx)
        # contiguous transitions stage B+1 unique frames, not 2B pairs
        assert "frames_rgb" in staged
        assert staged["frames_rgb"].shape[0] == 4

        video = np.asarray(proc._flow_from_staged(idx, staged))
        pairs = np.asarray(proc._flow_batch(idx))
        assert video.shape == pairs.shape
        # same checkpoint, same math; bf16 conv batching reassociation only
        assert np.abs(video - pairs).max() < 0.1

    def test_noncontiguous_batch_falls_back_to_pairs(self, synthetic,
                                                     tmp_path, monkeypatch):
        monkeypatch.setenv("SYNTHETIC_PATH", str(tmp_path))
        cfg = RunConfig(dataset="synthetic", mode="FLOW_FOE_CLUSTERING",
                        flow_source="RAFT", headless=True, batch_size=2)
        proc = Processor(cfg)
        proc.dataset = synthetic
        staged = proc._stage_batch([0, 2])
        assert "prevs_rgb" in staged and "frames_rgb" not in staged


class TestFarnebackSharedStaging:
    """Contiguous Farneback/LK batches stage B+1 unique gray frames; the
    device slices prevs/currs out of one upload. Flow must match the
    pair-staged path exactly (same arrays, different transport)."""

    @pytest.mark.slow
    def test_grays_staging_matches_flow_batch(self, synthetic, tmp_path,
                                              monkeypatch):
        monkeypatch.setenv("SYNTHETIC_PATH", str(tmp_path))
        cfg = RunConfig(dataset="synthetic", mode="FLOW_FOE_CLUSTERING",
                        flow_source="FARNEBACK", headless=True, batch_size=4)
        proc = Processor(cfg)
        proc.dataset = synthetic

        idx = [1, 2, 3, 4]
        staged = proc._stage_batch(idx)
        assert "grays" in staged and staged["grays"].shape[0] == 5
        shared = np.asarray(proc._flow_from_staged(idx, staged))
        pairs = np.asarray(proc._flow_batch(idx))
        np.testing.assert_allclose(shared, pairs, atol=1e-5)

    @pytest.mark.slow
    def test_lk_grays_staging(self, synthetic, tmp_path, monkeypatch):
        monkeypatch.setenv("SYNTHETIC_PATH", str(tmp_path))
        cfg = RunConfig(dataset="synthetic", mode="FLOW_FOE_CLUSTERING",
                        flow_source="LUCAS_KANADE", headless=True,
                        batch_size=2)
        proc = Processor(cfg)
        proc.dataset = synthetic
        idx = [0, 1]
        staged = proc._stage_batch(idx)
        assert "grays" in staged
        shared = np.asarray(proc._flow_from_staged(idx, staged))
        pairs = np.asarray(proc._flow_batch(idx))
        np.testing.assert_allclose(shared, pairs, atol=1e-4)


class TestHiresPipelineProbe:
    """The end-to-end product-loop probe (VERDICT r4 #6,
    tools/hires_pipeline_probe.py): materialize a mock-sim sequence in the
    reference directory contract, run the REAL Processor loop over it, and
    report the Tracer stage breakdown + host-staging overlap. The hires
    numbers live in PERF.md (chip-measured); this pins the probe's plumbing
    at a CI-sized resolution."""

    @pytest.mark.slow
    def test_probe_runs_and_reports_stages(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from tools.hires_pipeline_probe import materialize, run_probe

        root = str(tmp_path / "probe")
        os.makedirs(root, exist_ok=True)
        seq = materialize(root, (96, 128), frames=10)
        # idempotence: a second materialize must not re-collect
        assert materialize(root, (96, 128), frames=10) == seq
        out = run_probe(root, seq, batch=4, flow_source="FARNEBACK",
                        save_images=False)
        assert out["frames"] == 9
        for stage in ("flow", "stage+detect", "materialize", "artifacts"):
            assert stage in out["stages_total_s"], out
        assert out["host_stage_s"] > 0
        assert out["wall_s"] > 0
        # FrameResult artifacts landed under the materialized sequence
        jsons = glob.glob(os.path.join(root, seq, "results", "image_*.json"))
        assert len(jsons) == 9
