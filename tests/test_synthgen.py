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
