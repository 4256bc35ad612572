"""Native (C++) runtime loader tests: codec parity, batch, prefetch order."""
import os

import numpy as np
import pytest

from mav_detection_tpu.core.flo import read_flow as py_read, write_flow as py_write

native = pytest.importorskip("mav_detection_tpu.runtime.native_loader")


@pytest.fixture(scope="module")
def flo_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("flo")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(12):
        f = rng.normal(size=(40, 60, 2)).astype(np.float32)
        p = str(d / f"{i:06d}.flo")
        py_write(p, f)
        paths.append(p)
    return paths


class TestNativeCodec:
    def test_read_parity(self, flo_dir):
        a = native.read_flow(flo_dir[0])
        b = py_read(flo_dir[0])
        np.testing.assert_array_equal(a, b)

    def test_write_parity(self, flo_dir, tmp_path):
        f = py_read(flo_dir[1])
        p = str(tmp_path / "n.flo")
        native.write_flow(p, f)
        np.testing.assert_array_equal(py_read(p), f)

    def test_batch(self, flo_dir):
        batch = native.read_flow_batch(flo_dir, n_threads=3)
        assert batch.shape == (12, 40, 60, 2)
        for i in (0, 5, 11):
            np.testing.assert_array_equal(batch[i], py_read(flo_dir[i]))

    def test_corrupt_file_raises(self, tmp_path):
        bad = str(tmp_path / "bad.flo")
        with open(bad, "wb") as f:
            f.write(b"garbage")
        with pytest.raises(IOError):
            native.read_flow(bad)

    def test_wrong_shape_batch_raises(self, flo_dir, tmp_path):
        odd = str(tmp_path / "odd.flo")
        py_write(odd, np.zeros((8, 8, 2), np.float32))
        with pytest.raises(IOError):
            native.read_flow_batch([flo_dir[0], odd])


class TestPrefetcher:
    def test_in_order_complete(self, flo_dir):
        pf = native.FloPrefetcher(flo_dir, depth=3, n_threads=2)
        got = list(pf)
        pf.close()
        assert len(got) == len(flo_dir)
        for g, p in zip(got, flo_dir):
            np.testing.assert_array_equal(g, py_read(p))

    def test_early_close_no_hang(self, flo_dir):
        pf = native.FloPrefetcher(flo_dir, depth=2, n_threads=2)
        next(pf)
        pf.close()  # must not deadlock with producers mid-flight

    def test_depth_bounds_memory(self, flo_dir):
        """A lagging consumer must not let producers run ahead: in-flight
        (claimed-but-unconsumed) items stay <= depth even with more threads
        than depth and a stalled consumer."""
        import time

        pf = native.FloPrefetcher(flo_dir, depth=3, n_threads=4)
        time.sleep(0.3)  # consumer stalls; producers would race ahead
        assert pf.inflight() <= 3
        next(pf)
        time.sleep(0.1)
        assert pf.inflight() <= 3
        # draining still delivers everything, in order
        rest = list(pf)
        pf.close()
        assert len(rest) == len(flo_dir) - 1

    def test_inflight_drains_to_zero(self, flo_dir):
        pf = native.FloPrefetcher(flo_dir, depth=2, n_threads=2)
        for _ in range(len(flo_dir)):
            next(pf)
        assert pf.inflight() == 0
        pf.close()

    def test_bad_middle_file_raises_not_zeros(self, flo_dir, tmp_path):
        """A corrupt/truncated file must surface as IOError when its slot is
        delivered — never as a silent all-zero flow frame."""
        import shutil

        d = tmp_path / "seq"
        d.mkdir()
        paths = []
        for i, src in enumerate(flo_dir[:5]):
            p = str(d / f"{i:06d}.flo")
            shutil.copy(src, p)
            paths.append(p)
        # truncate the middle file's payload
        with open(paths[2], "r+b") as f:
            f.truncate(12 + 40 * 60 * 2 * 2)  # header + half the floats
        pf = native.FloPrefetcher(paths, depth=2, n_threads=2)
        a = next(pf)
        b = next(pf)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        with pytest.raises(IOError):
            next(pf)
        pf.close()

    def test_truncated_batch_read_raises(self, flo_dir, tmp_path):
        import shutil

        bad = str(tmp_path / "trunc.flo")
        shutil.copy(flo_dir[0], bad)
        with open(bad, "r+b") as f:
            f.truncate(12 + 100)
        with pytest.raises(IOError):
            native.read_flow_batch([flo_dir[0], bad])
