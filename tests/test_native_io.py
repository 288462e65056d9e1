"""Native IO runtime: parity with scipy, prefetch pool behaviour."""
import os

import numpy as np
import pytest

from mri_super_resolution_tpu.data import io as data_io
from mri_super_resolution_tpu.data import native_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native toolchain unavailable"
)

DATA = "/root/reference/anon_data"


def _mat_path():
    p = os.path.join(DATA, "pat07_mean_b0.mat")
    if not os.path.exists(p):
        pytest.skip("anon_data not present")
    return p


class TestNativeLoader:
    def test_parity_with_scipy(self):
        path = _mat_path()
        ours = native_io.load_mat_native(path, "data_mean_b0")
        ref = data_io.load_mat(path, "data_mean_b0")
        assert ours.shape == ref.shape
        np.testing.assert_array_equal(ours, ref.astype(np.float64))

    def test_roundtrip_saved_mat(self, tmp_path):
        import scipy.io as sio

        arr = np.random.default_rng(0).normal(size=(7, 5, 3)).astype(np.float32)
        path = str(tmp_path / "x.mat")
        sio.savemat(path, {"vol": arr})
        back = native_io.load_mat_native(path, "vol")
        np.testing.assert_allclose(back, arr.astype(np.float64), rtol=1e-6)

    def test_uncompressed_mat(self, tmp_path):
        import scipy.io as sio

        arr = np.arange(24, dtype=np.float64).reshape(4, 6)
        path = str(tmp_path / "u.mat")
        sio.savemat(path, {"m": arr}, do_compression=False)
        back = native_io.load_mat_native(path, "m")
        np.testing.assert_array_equal(back, arr)

    def test_missing_file_raises(self):
        with pytest.raises(RuntimeError):
            native_io.load_mat_native("/nonexistent/file.mat")

    def test_truncated_file_fails_cleanly(self, tmp_path):
        """Corrupt/truncated payload sizes must error, not read out of
        bounds: the declared tag size is untrusted data."""
        import scipy.io as sio

        arr = np.arange(4096, dtype=np.float64).reshape(64, 64)
        path = str(tmp_path / "t.mat")
        sio.savemat(path, {"m": arr}, do_compression=False)
        raw = bytearray(open(path, "rb").read())
        truncated = str(tmp_path / "trunc.mat")
        open(truncated, "wb").write(bytes(raw[: 128 + 64]))  # cut mid-element
        with pytest.raises(RuntimeError):
            native_io.load_mat_native(truncated, "m")
        # declared size far beyond the buffer (forged length field)
        forged = bytearray(raw)
        # miMATRIX tag right after the 128-byte header: blow up its size
        forged[132:136] = (0x7FFFFFF0).to_bytes(4, "little")
        fpath = str(tmp_path / "forged.mat")
        open(fpath, "wb").write(bytes(forged))
        with pytest.raises(RuntimeError):
            native_io.load_mat_native(fpath, "m")

    def test_complex_variable_skipped_with_note(self, tmp_path):
        import scipy.io as sio

        z = (np.arange(6) + 1j * np.arange(6)).reshape(2, 3)
        path = str(tmp_path / "c.mat")
        sio.savemat(path, {"z": z})
        with pytest.raises(RuntimeError):
            native_io.load_mat_native(path, "z")


class TestPrefetcher:
    def test_pool_returns_all(self):
        _mat_path()
        pf = native_io.Prefetcher(2)
        paths = [
            os.path.join(DATA, f"pat{p}_mean_b0.mat") for p in ("07", "08", "09")
        ]
        handles = [pf.submit(p) for p in paths]
        for h, p in zip(handles, paths):
            d = pf.get(h)
            assert "data_mean_b0" in d
            assert d["data_mean_b0"].shape == (128, 128, 28)

    def test_failed_prefetch_reports(self):
        pf = native_io.Prefetcher(2)
        h = pf.submit("/nonexistent/file.mat")
        with pytest.raises(RuntimeError):
            pf.get(h, timeout=10)
