"""Training-driver harness tests (no device training involved).

The reference delegates all training to external sidecars (FlowNet2/HRNet
dockers, a YOLOv4 server — ``/root/reference/src/datasets/dataset.py:107-123``);
our in-repo driver must be robust to resuming, so the selector logic gets its
own unit coverage with fake chunk/selector functions.
"""
import os

import jax
import numpy as np
import pytest

from mav_detection_tpu.cli.train import _scan_chunks


def _fake_run_chunk(delta):
    """Chunk runner over scalar 'params': params += delta each step."""
    def run_chunk(params, opt_state, key, nsteps):
        new = params + delta * nsteps
        losses = np.ones(nsteps, np.float32)
        return new, opt_state, key, losses
    return run_chunk


class TestScanChunksSelector:
    def test_resume_never_regresses_below_initial(self, tmp_path):
        """If every trained candidate scores worse than the resumed weights,
        the initial weights win and the checkpoint file is never touched."""
        ckpt = str(tmp_path / "best.msgpack")
        with open(ckpt, "wb") as f:
            f.write(b"sentinel")
        # params drift away from 0; selector prefers params near 0
        best, losses = _scan_chunks(
            _fake_run_chunk(delta=1.0), params=0.0, opt_state=None,
            key=jax.random.PRNGKey(0), steps=10, chunk=2, label="t",
            selector=lambda p: -abs(float(p)), select_every=1,
            save_best_to=ckpt)
        assert best == 0.0
        with open(ckpt, "rb") as f:
            assert f.read() == b"sentinel"
        assert losses.shape == (10,)

    def test_improving_candidate_is_selected_and_saved(self, tmp_path):
        ckpt = str(tmp_path / "best.msgpack")
        # params move from -10 toward 0 (+2/step); best score at p == 0
        best, _ = _scan_chunks(
            _fake_run_chunk(delta=1.0), params=-10.0, opt_state=None,
            key=jax.random.PRNGKey(0), steps=14, chunk=2, label="t",
            selector=lambda p: -abs(float(p)), select_every=1,
            save_best_to=ckpt)
        assert best == pytest.approx(0.0)
        assert os.path.exists(ckpt)

    def test_no_selector_returns_final_params(self):
        best, _ = _scan_chunks(
            _fake_run_chunk(delta=1.0), params=0.0, opt_state=None,
            key=jax.random.PRNGKey(0), steps=6, chunk=3, label="t")
        assert best == 6.0
