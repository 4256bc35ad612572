"""Window-search op tests vs reference-semantics oracles."""
import numpy as np
import pytest

import jax.numpy as jnp

from mav_detection_tpu.ops.geometry.boxsearch import (
    analyze_pyramid,
    optimize_window,
    make_flow_history,
    push_flow,
    accumulated_flow,
    blockshaped,
)


class TestAnalyzePyramid:
    def test_finds_bright_window(self):
        img = np.zeros((200, 300), np.float32)
        img[80:130, 150:200] = 10.0  # bright 50x50 blob
        res = analyze_pyramid(jnp.asarray(img))
        x, y, w, h = np.asarray(res.box_xywh)
        # winning 64x64 window must cover most of the blob
        assert x <= 150 and x + w >= 195
        assert y <= 82 and y + h >= 128
        assert float(res.score) > 0

    def test_oracle_parity_level0(self):
        """Level-0 window argmax must match a brute-force sliding window."""
        rng = np.random.default_rng(0)
        img = rng.random((128, 160)).astype(np.float32)
        res = analyze_pyramid(jnp.asarray(img), window=64, step=16, n_levels=1)
        best, bx, by = -1.0, 0, 0
        for y in range(0, 128 - 64 + 1, 16):
            for x in range(0, 160 - 64 + 1, 16):
                s = img[y:y + 64, x:x + 64].sum()
                if s > best:
                    best, bx, by = s, x, y
        assert float(res.score) == pytest.approx(best, rel=1e-4)
        assert np.asarray(res.box_xywh)[0] == pytest.approx(bx, abs=0.5)
        assert np.asarray(res.box_xywh)[1] == pytest.approx(by, abs=0.5)


class TestOptimizeWindow:
    def test_grows_to_cover_blob(self):
        img = np.zeros((100, 100), np.float32)
        img[30:70, 40:90] = 1.0
        sc, box = optimize_window(jnp.asarray(img),
                                  jnp.asarray([50.0, 45.0, 10.0, 10.0]))
        x, y, w, h = np.asarray(box)
        assert x <= 41 and x + w >= 89
        assert y <= 31 and y + h >= 69
        assert float(sc) >= 40 * 50 * 0.95

    def test_reference_greedy_oracle(self):
        """Compare against a literal re-implementation of the reference's
        hill climb on a small random image."""
        rng = np.random.default_rng(1)
        img = rng.random((40, 40)).astype(np.float32)
        start = (10.0, 12.0, 8.0, 9.0)

        def ref_score(x0, y0, x1, y1):
            x0i, y0i = int(max(x0, 0)), int(max(y0, 0))
            x1i, y1i = int(min(x1, 40)), int(min(y1, 40))
            if x1i <= x0i or y1i <= y0i:
                return 0.0
            return float(img[y0i:y1i, x0i:x1i].sum())

        best = (ref_score(start[0], start[1], start[0] + start[2],
                          start[1] + start[3]), start)
        while True:
            box = best[1]
            inter = (0.0, box)
            for corner in (0, 1):
                for di in (-1, 1):
                    for dj in (-1, 1):
                        if corner == 0:
                            cand = (box[0] + di, box[1] + dj,
                                    box[2] - di, box[3] - dj)
                        else:
                            cand = (box[0], box[1], box[2] + di, box[3] + dj)
                        s = ref_score(cand[0], cand[1], cand[0] + cand[2],
                                      cand[1] + cand[3])
                        if s > inter[0]:
                            inter = (s, cand)
            if inter[0] <= best[0]:
                break
            best = inter

        sc, box = optimize_window(jnp.asarray(img), jnp.asarray(start))
        assert float(sc) == pytest.approx(best[0], rel=1e-4)


class TestFlowHistory:
    def test_constant_flow_accumulates(self):
        hist = make_flow_history(4, 32, 32)
        flow = jnp.full((32, 32, 2), 1.5, jnp.float32)
        for _ in range(4):
            hist = push_flow(hist, flow)
        acc = np.asarray(accumulated_flow(hist))
        # constant field: accumulation = 4 * 1.5 away from borders
        inner = acc[4:-12, 4:-12]
        np.testing.assert_allclose(inner, 6.0, atol=1e-3)

    def test_ring_overwrite(self):
        hist = make_flow_history(2, 8, 8)
        hist = push_flow(hist, jnp.ones((8, 8, 2)))
        hist = push_flow(hist, jnp.ones((8, 8, 2)) * 2)
        hist = push_flow(hist, jnp.ones((8, 8, 2)) * 3)  # overwrites slot 0
        buf = np.asarray(hist.buffer)
        assert buf[0, 0, 0, 0] == 3.0
        assert buf[1, 0, 0, 0] == 2.0


class TestBlockshaped:
    def test_matches_reference_layout(self):
        arr = jnp.arange(24.0).reshape(4, 6)
        blocks = np.asarray(blockshaped(arr, 2, 3))
        # reference semantics: row-major subblocks preserving layout
        a = np.arange(24.0).reshape(4, 6)
        ref = (a.reshape(2, 2, 2, 3).swapaxes(1, 2).reshape(-1, 2, 3))
        np.testing.assert_array_equal(blocks, ref)
