"""Pallas fused-iteration Farneback kernel: parity + batching semantics.

Runs in Pallas interpreter mode on CPU (the TPU lowering is exercised by
bench.py / PERF.md measurements on hardware).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mav_detection_tpu.ops.flow import FarnebackParams, farneback_flow
from mav_detection_tpu.ops.flow.farneback import (
    _border_scale_map,
    _poly_exp,
    farneback_flow_batch,
)
from mav_detection_tpu.ops.flow.farneback_pallas import farneback_iterate_pallas

cv2 = pytest.importorskip("cv2")


def _scene(h, w, tx=2.4, ty=1.6, seed=0):
    rng = np.random.default_rng(seed)
    base = cv2.GaussianBlur(rng.random((h, w)).astype(np.float32), (0, 0), 1.5) * 255
    M = np.float32([[1, 0, tx], [0, 1, ty]])
    curr = cv2.warpAffine(base, M, (w, h))
    return base.astype(np.uint8), curr.astype(np.uint8)


def _pallas_flow(prev8, curr8, iterations=10, band_rows=32):
    """Through the public API (includes the level pre-smoothing, like cv2);
    warp='pallas' auto-selects interpreter mode on CPU."""
    del band_rows
    return np.asarray(farneback_flow(
        jnp.asarray(prev8), jnp.asarray(curr8),
        FarnebackParams(warp="pallas", iterations=iterations)))


class TestFusedIteration:
    @pytest.mark.slow
    def test_single_iteration_matches_xla_path(self):
        """One fused iteration == one XLA update_matrices + solve (to fp32
        noise); later iterations only amplify fp ordering differences."""
        from mav_detection_tpu.ops.flow.farneback import (
            _solve_flow,
            _update_matrices,
        )

        prev8, curr8 = _scene(64, 96)
        p = jnp.asarray(prev8, jnp.float32)[..., None]
        c = jnp.asarray(curr8, jnp.float32)[..., None]
        R0 = _poly_exp(p, 8, 1.2)
        R1 = _poly_exp(c, 8, 1.2)
        border = _border_scale_map(64, 96)
        M = _update_matrices(R0, R1, jnp.zeros((64, 96, 1, 2)), border,
                             "separable", 16)
        ref = np.asarray(_solve_flow(M, 12))[:, :, 0]
        out = farneback_iterate_pallas(
            jnp.transpose(R0, (2, 3, 0, 1)), jnp.transpose(R1, (2, 3, 0, 1)),
            jnp.zeros((1, 2, 64, 96)), border, iterations=1, band_rows=32,
            interpret=True)
        got = np.transpose(np.asarray(out)[0], (1, 2, 0))
        assert np.abs(got - ref).max() < 1e-4

    @pytest.mark.slow
    def test_epe_vs_cv2_oracle(self):
        prev8, curr8 = _scene(96, 128)
        ref = cv2.calcOpticalFlowFarneback(prev8, curr8, None,
                                           0.4, 1, 12, 10, 8, 1.2, 0)
        got = _pallas_flow(prev8, curr8)
        epe = np.linalg.norm(got - ref, axis=-1)
        assert epe.mean() < 0.1            # BASELINE.json gate
        assert epe[8:-8, 8:-8].mean() < 0.02

    @pytest.mark.slow
    def test_nondivisible_band_rows(self):
        """H=90 with band_rows=32 -> ragged last band must still be exact."""
        prev8, curr8 = _scene(90, 96, seed=3)
        got = _pallas_flow(prev8, curr8, iterations=2, band_rows=32)
        ref = np.asarray(farneback_flow(
            jnp.asarray(prev8), jnp.asarray(curr8),
            FarnebackParams(warp="separable", iterations=2)))
        assert np.abs(got - ref).max() < 1e-3

    @pytest.mark.slow
    def test_batch_equals_single(self):
        """Batched channel-first run must equal per-frame runs."""
        scenes = [_scene(64, 96, seed=s, tx=1.0 + s, ty=0.5 * s)
                  for s in range(3)]
        p = jnp.asarray(np.stack([s[0] for s in scenes]), jnp.float32)
        c = jnp.asarray(np.stack([s[1] for s in scenes]), jnp.float32)
        R0 = _poly_exp(p.transpose(1, 2, 0), 8, 1.2)
        R1 = _poly_exp(c.transpose(1, 2, 0), 8, 1.2)
        border = _border_scale_map(64, 96)
        out = farneback_iterate_pallas(
            jnp.transpose(R0, (2, 3, 0, 1)), jnp.transpose(R1, (2, 3, 0, 1)),
            jnp.zeros((3, 2, 64, 96)), border, iterations=3, band_rows=32,
            interpret=True)
        for k in range(3):
            single = farneback_iterate_pallas(
                jnp.transpose(R0[:, :, k:k + 1], (2, 3, 0, 1)),
                jnp.transpose(R1[:, :, k:k + 1], (2, 3, 0, 1)),
                jnp.zeros((1, 2, 64, 96)), border, iterations=3,
                band_rows=32, interpret=True)
            np.testing.assert_allclose(np.asarray(out)[k],
                                       np.asarray(single)[0], atol=1e-4)

    @pytest.mark.slow
    def test_column_tiling_matches_whole_width(self):
        """tile_cols splits (incl. a ragged last tile) must reproduce the
        whole-width kernel exactly — the P-column halo covers every slab
        read the warp can make, so per-tile math is identical."""
        prev8, curr8 = _scene(64, 96, seed=11)
        p = jnp.asarray(prev8, jnp.float32)[..., None]
        c = jnp.asarray(curr8, jnp.float32)[..., None]
        R0 = jnp.transpose(_poly_exp(p, 8, 1.2), (2, 3, 0, 1))
        R1 = jnp.transpose(_poly_exp(c, 8, 1.2), (2, 3, 0, 1))
        border = _border_scale_map(64, 96)
        kw = dict(iterations=3, band_rows=32, interpret=True)
        whole = np.asarray(farneback_iterate_pallas(
            R0, R1, jnp.zeros((1, 2, 64, 96)), border, **kw))
        for tile_cols in (48, 40):   # even split + ragged overhang split
            tiled = np.asarray(farneback_iterate_pallas(
                R0, R1, jnp.zeros((1, 2, 64, 96)), border,
                tile_cols=tile_cols, **kw))
            np.testing.assert_allclose(tiled, whole, atol=1e-5,
                                       err_msg=f"tile_cols={tile_cols}")

    @pytest.mark.slow
    def test_element_halo_matches_stacked(self):
        """halo="element" (pl.Element windows into edge-padded planes — no
        per-iteration XLA restack) must be bit-exact with the stacked-halo
        layout, whole-width and column-tiled."""
        prev8, curr8 = _scene(64, 96, seed=13)
        p = jnp.asarray(prev8, jnp.float32)[..., None]
        c = jnp.asarray(curr8, jnp.float32)[..., None]
        R0 = jnp.transpose(_poly_exp(p, 8, 1.2), (2, 3, 0, 1))
        R1 = jnp.transpose(_poly_exp(c, 8, 1.2), (2, 3, 0, 1))
        border = _border_scale_map(64, 96)
        for extra in ({}, {"tile_cols": 40}):
            kw = dict(iterations=3, band_rows=16, max_shift=8,
                      interpret=True, **extra)
            stacked = np.asarray(farneback_iterate_pallas(
                R0, R1, jnp.zeros((1, 2, 64, 96)), border,
                halo="stacked", **kw))
            element = np.asarray(farneback_iterate_pallas(
                R0, R1, jnp.zeros((1, 2, 64, 96)), border,
                halo="element", **kw))
            np.testing.assert_array_equal(element, stacked,
                                          err_msg=f"extra={extra}")

    @pytest.mark.slow
    def test_element_halo_multi_column_tile(self):
        """VERDICT r3 #3: with 128-aligned tiles the element-halo layout
        runs MULTI-tile (lane-aligned Element column starts t*tw, block
        width rounded to the 128 tiling with dead right columns) and stays
        bit-exact with stacked — including a ragged last tile. Hardware
        parity lives in tools/wide_frame_check.py; this pins interpret-mode
        semantics."""
        H, W = 48, 320           # tile_cols=128 -> 3 tiles, last ragged (64)
        prev8, curr8 = _scene(H, W, seed=17, tx=1.5, ty=-0.7)
        p = jnp.asarray(prev8, jnp.float32)[..., None]
        c = jnp.asarray(curr8, jnp.float32)[..., None]
        R0 = jnp.transpose(_poly_exp(p, 8, 1.2), (2, 3, 0, 1))
        R1 = jnp.transpose(_poly_exp(c, 8, 1.2), (2, 3, 0, 1))
        border = _border_scale_map(H, W)
        kw = dict(iterations=2, band_rows=16, max_shift=8, tile_cols=128,
                  interpret=True)
        stacked = np.asarray(farneback_iterate_pallas(
            R0, R1, jnp.zeros((1, 2, H, W)), border, halo="stacked", **kw))
        element = np.asarray(farneback_iterate_pallas(
            R0, R1, jnp.zeros((1, 2, H, W)), border, halo="element", **kw))
        np.testing.assert_array_equal(element, stacked)

    def test_wide_frame_auto_tiles(self):
        """W > 1024 auto-splits into column tiles and still matches the
        XLA separable path (the AirSim 1920-wide readiness guarantee)."""
        prev8, curr8 = _scene(16, 1100, seed=13, tx=1.2, ty=0.4)
        got = np.asarray(farneback_flow(
            jnp.asarray(prev8), jnp.asarray(curr8),
            FarnebackParams(warp="pallas", iterations=2, levels=1)))
        ref = np.asarray(farneback_flow(
            jnp.asarray(prev8), jnp.asarray(curr8),
            FarnebackParams(warp="separable", iterations=2, levels=1)))
        assert np.abs(got - ref).max() < 1e-3

    @pytest.mark.slow
    def test_via_farneback_flow_params(self):
        """warp='pallas' is reachable through the public solver API."""
        prev8, curr8 = _scene(64, 96, seed=5)
        got = np.asarray(farneback_flow(
            jnp.asarray(prev8), jnp.asarray(curr8),
            FarnebackParams(warp="pallas", iterations=3)))
        ref = np.asarray(farneback_flow(
            jnp.asarray(prev8), jnp.asarray(curr8),
            FarnebackParams(warp="separable", iterations=3)))
        assert np.abs(got - ref).max() < 1e-3

    @pytest.mark.slow
    def test_batched_public_api(self):
        prev8a, curr8a = _scene(64, 96, seed=7)
        prev8b, curr8b = _scene(64, 96, seed=8, tx=-1.5, ty=2.0)
        params = FarnebackParams(warp="pallas", iterations=3)
        batch = np.asarray(farneback_flow_batch(
            jnp.asarray(np.stack([prev8a, prev8b])),
            jnp.asarray(np.stack([curr8a, curr8b])), params))
        one = np.asarray(farneback_flow(
            jnp.asarray(prev8a), jnp.asarray(curr8a), params))
        np.testing.assert_allclose(batch[0], one, atol=1e-4)

    @pytest.mark.slow
    def test_batched_channel_first_pyramid(self):
        """The batched Pallas path runs the channel-first pipeline
        (``_farneback_cf`` with fused smooth+resize+poly matrices); a
        multi-layer pyramid must still match the per-frame (h, w, b)
        solver, exercising the fused per-layer matrices AND the
        channel-first inter-layer flow resize."""
        prev8a, curr8a = _scene(96, 128, seed=11)
        prev8b, curr8b = _scene(96, 128, seed=12, tx=-2.0, ty=3.0)
        params = FarnebackParams(levels=2, pyr_scale=0.5, warp="pallas",
                                 iterations=4, max_shift=8, band_rows=24)
        batch = np.asarray(farneback_flow_batch(
            jnp.asarray(np.stack([prev8a, prev8b])),
            jnp.asarray(np.stack([curr8a, curr8b])), params))
        for i, (p8, c8) in enumerate(((prev8a, curr8a), (prev8b, curr8b))):
            one = np.asarray(farneback_flow(
                jnp.asarray(p8), jnp.asarray(c8), params))
            np.testing.assert_allclose(batch[i], one, atol=1e-4)


class TestResizeMatrix:
    def test_resize_matrix_matches_jax_image_resize(self):
        """_resize_matrix_np re-states jax.image.resize's linear weights in
        numpy (half-pixel sampling, antialias on downscale, edge
        renormalization) so fused pyramid matrices can build inside a
        trace; pin exact agreement with the op for up/down/odd sizes."""
        from mav_detection_tpu.ops.flow.farneback import _resize_matrix_np

        rng = np.random.default_rng(0)
        for src, dst in [(480, 240), (752, 188), (97, 53), (53, 97),
                         (100, 150), (64, 64)]:
            x = rng.random((src, 16)).astype(np.float32)
            ref = np.asarray(jax.image.resize(jnp.asarray(x), (dst, 16),
                                              method="linear"))
            got = (_resize_matrix_np(src, dst) @ x.astype(np.float64))
            np.testing.assert_allclose(got.astype(np.float32), ref,
                                       atol=1e-5)
