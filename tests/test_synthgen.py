"""On-device synthetic scene generator (data/synthgen): consistency checks.

The generator is the training-data source for all three learned models, so
its physical consistency (img2 == img1 warped by the GT flow) is what makes
the shipped checkpoints meaningful.
"""
import numpy as np

import jax
import jax.numpy as jnp

from mav_detection_tpu.data.synthgen import (
    SynthScene,
    _sample_bilinear,
    generate_batch,
    generate_scene,
)

H, W = 96, 128


class TestGenerateScene:
    def test_shapes_and_ranges(self):
        s = generate_scene(jax.random.PRNGKey(0), H, W)
        assert s.img1.shape == (H, W) and s.img2.shape == (H, W)
        assert s.flow.shape == (H, W, 2)
        assert s.sky.shape == (H, W) and s.seg.shape == (H, W)
        assert float(s.img1.min()) >= 0 and float(s.img1.max()) <= 255
        assert np.isfinite(np.asarray(s.flow)).all()

    def test_photometric_consistency(self):
        """img2 sampled at x + flow(x) must reproduce img1 away from the
        drone/borders/horizon seam (up to augmentation noise)."""
        s = generate_scene(jax.random.PRNGKey(3), H, W)
        xs, ys = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        flow = np.asarray(s.flow)
        warped = np.asarray(_sample_bilinear(
            s.img2, jnp.asarray(xs + flow[..., 0]),
            jnp.asarray(ys + flow[..., 1])))
        m = ~np.asarray(s.seg)
        m[:8] = m[-8:] = False
        m[:, :8] = m[:, -8:] = False
        hy = int(np.asarray(s.sky).sum(0).max())
        m[max(hy - 6, 0):hy + 6] = False
        err = np.abs(warped - np.asarray(s.img1))[m]
        assert err.mean() < 5.0
        assert np.percentile(err, 95) < 12.0

    def test_sky_brighter_and_smoother_than_ground(self):
        s = generate_scene(jax.random.PRNGKey(7), H, W)
        img = np.asarray(s.img1)
        sky = np.asarray(s.sky) & ~np.asarray(s.seg)
        ground = ~np.asarray(s.sky) & ~np.asarray(s.seg)
        assert img[sky].mean() > img[ground].mean() + 20

    def test_box_matches_segmentation(self):
        s = generate_scene(jax.random.PRNGKey(5), H, W)
        seg = np.asarray(s.seg)
        assert seg.any()
        ys, xs = np.nonzero(seg)
        cx, cy, bw, bh = np.asarray(s.box)
        assert abs(xs.mean() - cx) < 2.0 and abs(ys.mean() - cy) < 2.0
        assert xs.max() - xs.min() <= bw + 1
        assert ys.max() - ys.min() <= bh + 1

    def test_drone_flow_override(self):
        s = generate_scene(jax.random.PRNGKey(9), H, W)
        seg = np.asarray(s.seg)
        flow = np.asarray(s.flow)
        inside = flow[seg]
        # every drone pixel carries the same velocity vector
        assert np.ptp(inside[:, 0]) < 1e-5 and np.ptp(inside[:, 1]) < 1e-5

    def test_deterministic_per_key(self):
        a = generate_scene(jax.random.PRNGKey(11), H, W)
        b = generate_scene(jax.random.PRNGKey(11), H, W)
        np.testing.assert_array_equal(np.asarray(a.img1), np.asarray(b.img1))
        c = generate_scene(jax.random.PRNGKey(12), H, W)
        assert np.abs(np.asarray(a.img1) - np.asarray(c.img1)).mean() > 1.0

    def test_pan_zero_is_legacy_identical(self):
        """pan_max=0 must not perturb any existing fixture: same code path,
        same bits (the inflate/crop only engages when pan_max > 0)."""
        a = generate_scene(jax.random.PRNGKey(21), H, W)
        b = generate_scene(jax.random.PRNGKey(21), H, W, pan_max=0.0)
        np.testing.assert_array_equal(np.asarray(a.img1), np.asarray(b.img1))
        np.testing.assert_array_equal(np.asarray(a.flow), np.asarray(b.flow))

    def test_batch_stacks_scenes(self):
        batch = generate_batch(jax.random.PRNGKey(0), 3, H, W)
        assert batch.img1.shape == (3, H, W)
        assert batch.box.shape == (3, 4)
        single = generate_scene(jax.random.split(jax.random.PRNGKey(0), 3)[1],
                                H, W)
        # vmap reassociates the texture-normalization reductions, so batched
        # and single renders differ at float32 rounding scale (~1e-2 gray
        # levels out of 255) — identical scenes, not identical bits
        np.testing.assert_allclose(np.asarray(batch.img1[1]),
                                   np.asarray(single.img1), atol=0.05)


class TestPanCurriculum:
    """pan_max > 0: the large-motion curriculum (PERF.md 'RAFT motion
    cap'). The whole scene gains a uniform camera pan; supervision must
    stay physically consistent at the new motion scale."""

    PAN = 12.0

    def test_shapes_cropped_back(self):
        s = generate_scene(jax.random.PRNGKey(0), H, W, pan_max=self.PAN)
        assert s.img1.shape == (H, W) and s.flow.shape == (H, W, 2)
        assert s.seg.shape == (H, W) and s.sky.shape == (H, W)

    def test_flow_reaches_large_motion(self):
        """Across a handful of keys the curriculum must actually produce
        |flow| beyond the legacy families' ~5 px ceiling — that is its
        entire purpose."""
        peak = 0.0
        for k in range(6):
            s = generate_scene(jax.random.PRNGKey(k), H, W,
                               pan_max=self.PAN)
            peak = max(peak, float(jnp.abs(s.flow).max()))
        assert peak > 8.0, peak

    def test_photometric_consistency_with_pan(self):
        """img2 sampled at x + flow(x) reproduces img1 away from drone/
        borders/horizon — i.e. the pan is rendered from inflated frames,
        never from a replicate-border smear (which would be mislabeled
        supervision)."""
        from mav_detection_tpu.data.synthgen import _sample_bilinear

        s = generate_scene(jax.random.PRNGKey(3), H, W, pan_max=self.PAN)
        xs, ys = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))
        flow = np.asarray(s.flow)
        warped = np.asarray(_sample_bilinear(
            s.img2, jnp.asarray(xs + flow[..., 0]),
            jnp.asarray(ys + flow[..., 1])))
        m = ~np.asarray(s.seg)
        b = int(np.ceil(self.PAN)) + 10
        m[:b] = m[-b:] = False
        m[:, :b] = m[:, -b:] = False
        hy = int(np.asarray(s.sky).sum(0).max())
        m[max(hy - 6, 0):hy + 6] = False
        err = np.abs(warped - np.asarray(s.img1))[m]
        assert err.mean() < 5.0
        assert np.percentile(err, 95) < 12.0

    def test_drone_apparent_motion_includes_pan(self):
        """The intruder's flow stays uniform (it is the override) and its
        velocity distribution widens by the pan — the camera moves every
        scene point."""
        s = generate_scene(jax.random.PRNGKey(9), H, W, pan_max=self.PAN)
        seg = np.asarray(s.seg)
        assert seg.any()
        inside = np.asarray(s.flow)[seg]
        assert np.ptp(inside[:, 0]) < 1e-5 and np.ptp(inside[:, 1]) < 1e-5

    def test_batch_with_pan(self):
        b = generate_batch(jax.random.PRNGKey(1), 2, H, W,
                           pan_max=self.PAN)
        assert b.img1.shape == (2, H, W) and b.flow.shape == (2, H, W, 2)
