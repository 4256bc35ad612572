"""Sparse-FoE trace history: 20-frame rollback consensus + replenishment.

Behavioral parity target: the reference's LK trace lists
(``/root/reference/src/focus_of_expansion.py:88-148``) — per-track position
history, FoE lines drawn from the position ROLLBACK frames back to the
current one, traces severed when a pool slot is re-seeded.
"""
import numpy as np

import jax
import jax.numpy as jnp

from mav_detection_tpu.ops.geometry import (
    get_foe_sparse,
    get_foe_sparse_traced,
    trace_init,
    trace_update,
)

FOE = np.array([160.0, 120.0])
EXPANSION = 0.01


def _advance(pts: np.ndarray, noise: np.ndarray) -> np.ndarray:
    """One frame of radial expansion about FOE + per-track pixel noise."""
    return pts + EXPANSION * (pts - FOE) + noise


def _simulate(n_tracks=64, n_frames=25, noise_px=0.3, seed=0,
              replenish_at=None, replenish_slots=()):
    """Run the trace state over a synthetic radially-expanding track field."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([40, 40], [280, 200], size=(n_tracks, 2))
    state = trace_init(n_tracks)
    valid = jnp.ones(n_tracks, bool)
    state = trace_update(state, jnp.asarray(pts, jnp.float32), valid,
                         jnp.zeros(n_tracks, bool))
    for f in range(1, n_frames):
        noise = rng.normal(scale=noise_px, size=(n_tracks, 2))
        pts = _advance(pts, noise)
        new_track = np.zeros(n_tracks, bool)
        if replenish_at is not None and f == replenish_at:
            new_track[list(replenish_slots)] = True
            pts[list(replenish_slots)] = rng.uniform(
                [40, 40], [280, 200], size=(len(replenish_slots), 2))
        state = trace_update(state, jnp.asarray(pts, jnp.float32), valid,
                             jnp.asarray(new_track))
    return state, pts


class TestRandomizedPairing:
    """VERDICT r3 #10: the partner line is now a PRNG permutation when a key
    is given. Distribution check against the reference's iid-uniform random
    pairing (``focus_of_expansion.py:142-145``) on a raster-ordered grid —
    the adversarial fixture for the old fixed roll, where index neighbors are
    image neighbors and rolled pairs intersect at shallow angles."""

    def _grid_fixture(self, seed: int, noise_px: float = 0.15):
        rng = np.random.default_rng(seed)
        gx, gy = np.meshgrid(np.linspace(48.0, 272.0, 12),
                             np.linspace(48.0, 192.0, 8))
        pts0 = np.stack([gx.ravel(), gy.ravel()], -1)
        pts1 = _advance(pts0, rng.normal(scale=noise_px, size=pts0.shape))
        return pts0, pts1, rng

    def test_permutation_matches_reference_distribution(self):
        from mav_detection_tpu.ops.geometry.foe import (
            foe_ransac,
            line_intersections,
        )

        errs_perm, errs_ref = [], []
        for s in range(24):
            pts0, pts1, rng = self._grid_fixture(100 + s)
            n = len(pts0)
            old = jnp.asarray(pts0, jnp.float32)
            new = jnp.asarray(pts1, jnp.float32)
            valid = jnp.ones(n, bool)

            foe_p = np.asarray(get_foe_sparse(old, new, valid,
                                              key=jax.random.PRNGKey(s)))
            errs_perm.append(np.linalg.norm(foe_p - FOE))

            # the reference's pairing: iid-uniform partner index (self-picks
            # intersect as parallel and drop), same intersection + vote
            d = new - old
            idx = jnp.asarray(rng.integers(0, n, size=n))
            pts_i, ok = line_intersections(new, -d, new[idx], -d[idx])
            ok = ok & (pts_i[..., 0] != 0.0)
            foe_r = np.asarray(
                foe_ransac(jnp.where(ok[:, None], pts_i, 0.0), ok))
            errs_ref.append(np.linalg.norm(foe_r - FOE))

        # same estimator, same quality: matched means, both accurate
        assert abs(float(np.mean(errs_perm)) - float(np.mean(errs_ref))) < 2.0, (
            np.mean(errs_perm), np.mean(errs_ref))
        assert float(np.mean(errs_perm)) < 10.0

    def test_keyed_pairing_is_deterministic_per_key(self):
        pts0, pts1, _ = self._grid_fixture(7)
        old = jnp.asarray(pts0, jnp.float32)
        new = jnp.asarray(pts1, jnp.float32)
        valid = jnp.ones(len(pts0), bool)
        k = jax.random.PRNGKey(3)
        a = np.asarray(get_foe_sparse(old, new, valid, key=k))
        b = np.asarray(get_foe_sparse(old, new, valid, key=k))
        np.testing.assert_array_equal(a, b)
        # and keyless stays the historical rolled pairing (bit-stable API)
        c = np.asarray(get_foe_sparse(old, new, valid))
        assert np.isfinite(c).all()


class TestTraceHistory:
    def test_rollback_beats_single_frame(self):
        """With noisy 1-px/frame motion, the 20-frame baseline lines localize
        the FoE far better than consecutive-frame lines."""
        state, pts = _simulate(noise_px=0.4)
        foe_traced = np.asarray(get_foe_sparse_traced(state))

        prev = np.asarray(state.positions[(state.head - 1) % state.positions.shape[0]])
        foe_single = np.asarray(get_foe_sparse(
            jnp.asarray(prev), jnp.asarray(pts, jnp.float32),
            jnp.ones(len(pts), bool)))

        err_traced = np.linalg.norm(foe_traced - FOE)
        err_single = np.linalg.norm(foe_single - FOE)
        assert err_traced < 10.0
        assert err_traced < err_single

    def test_noiseless_exact(self):
        state, _ = _simulate(noise_px=0.0)
        foe = np.asarray(get_foe_sparse_traced(state))
        np.testing.assert_allclose(foe, FOE, atol=1.0)

    def test_age_clamps_rollback(self):
        """A short history (age < rollback) must still produce a finite FoE
        using the longest available baseline."""
        state, _ = _simulate(n_frames=5, noise_px=0.0)
        foe = np.asarray(get_foe_sparse_traced(state))
        np.testing.assert_allclose(foe, FOE, atol=2.0)

    def test_traces_survive_replenishment(self):
        """Re-seeding SOME pool slots must not corrupt the others' history:
        survivors keep their long baselines and the FoE stays accurate;
        replaced slots restart at age 0."""
        state, _ = _simulate(n_frames=25, noise_px=0.0, replenish_at=20,
                             replenish_slots=range(0, 16))
        age = np.asarray(state.age)
        assert (age[:16] == 4).all()          # re-seeded 4 frames ago
        assert (age[16:] == 24).all()         # survivors keep counting
        foe = np.asarray(get_foe_sparse_traced(state))
        np.testing.assert_allclose(foe, FOE, atol=1.5)

    def test_dead_tracks_excluded(self):
        state, pts = _simulate(n_frames=12, noise_px=0.0)
        # kill the second half of the pool on the final frame (contiguous:
        # the consensus pairs each line with its rolled neighbor)
        valid = jnp.asarray(np.arange(len(pts)) < len(pts) // 2)
        state = trace_update(state, jnp.asarray(pts, jnp.float32), valid,
                             jnp.zeros(len(pts), bool))
        foe = np.asarray(get_foe_sparse_traced(state))
        np.testing.assert_allclose(foe, FOE, atol=2.0)
