"""Native C++ EuRoC loader vs the Python reader on generated fixtures."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from orcvio_tpu.dataio.euroc import bin_imu_per_frame, load_euroc
from orcvio_tpu.dataio.native import NativeEurocLoader, build_native


def make_fake_euroc(tmp_path, n_imu=200, n_cam=12, W=64, H=48):
    rng = np.random.default_rng(0)
    mav = tmp_path / "mav0"
    (mav / "imu0").mkdir(parents=True)
    (mav / "cam0" / "data").mkdir(parents=True)
    (mav / "state_groundtruth_estimate0").mkdir(parents=True)
    t_ns = (1e9 * (5.0 + np.arange(n_imu) * 0.005)).astype(np.int64)
    imu = np.column_stack([t_ns, rng.normal(size=(n_imu, 6))])
    with open(mav / "imu0" / "data.csv", "w") as f:
        f.write("#ts,gx,gy,gz,ax,ay,az\n")
        for row in imu:
            f.write(f"{int(row[0])}," + ",".join(f"{v:.9f}" for v in row[1:]) + "\n")
    cam_ns = (1e9 * (5.0 + np.arange(n_cam) * 0.08)).astype(np.int64)
    images = {}
    with open(mav / "cam0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],filename\n")
        for ts in cam_ns:
            name = f"{ts}.png"
            img = rng.integers(0, 255, size=(H, W), dtype=np.uint8)
            cv2.imwrite(str(mav / "cam0" / "data" / name), img)
            images[int(ts)] = img
            f.write(f"{ts},{name}\n")
    with open(mav / "state_groundtruth_estimate0" / "data.csv", "w") as f:
        f.write("#hdr\n")
        for i in range(20):
            f.write(f"{t_ns[i]}," + ",".join(f"{v:.6f}" for v in rng.normal(size=16)) + "\n")
    return str(tmp_path), images, cam_ns


@pytest.fixture(scope="module")
def so_built():
    path = build_native()
    if path is None:
        pytest.skip("native toolchain unavailable")
    return path


class TestNativeLoader:
    def test_matches_python_reader(self, tmp_path, so_built):
        root, images, cam_ns = make_fake_euroc(tmp_path)
        py = load_euroc(root)
        nat = NativeEurocLoader(root, prefetch_threads=0)
        assert nat.n_frames == len(py.cam_t)
        assert nat.n_imu == len(py.imu_t)
        assert np.allclose(nat.cam_t, py.cam_t, atol=1e-9)
        assert np.allclose(nat.imu_t, py.imu_t, atol=1e-9)
        assert np.allclose(nat.gyro, py.gyro, atol=1e-9)
        assert np.allclose(nat.acc, py.acc, atol=1e-9)
        assert np.allclose(nat.gt_t, py.gt_t, atol=1e-9)
        assert np.allclose(nat.gt_p, py.gt_p, atol=1e-6)
        nat.close()

    def test_bin_imu_matches_python(self, tmp_path, so_built):
        root, images, cam_ns = make_fake_euroc(tmp_path)
        py = load_euroc(root)
        t_p, g_p, a_p, m_p = bin_imu_per_frame(py, slab=24)
        nat = NativeEurocLoader(root, prefetch_threads=0)
        t_n, g_n, a_n, m_n = nat.bin_imu(slab=24)
        assert np.array_equal(m_p, m_n)
        assert np.allclose(t_p[m_p], t_n[m_n], atol=1e-12)
        assert np.allclose(g_p[m_p], g_n[m_n], atol=1e-12)
        nat.close()

    def test_image_decode_exact(self, tmp_path, so_built):
        root, images, cam_ns = make_fake_euroc(tmp_path)
        nat = NativeEurocLoader(root, prefetch_threads=0)
        assert (nat.width, nat.height) == (64, 48)
        img0 = nat.get_image(0)
        assert np.array_equal(img0.astype(np.uint8), images[int(cam_ns[0])])
        img5 = nat.get_image(5)
        assert np.array_equal(img5.astype(np.uint8), images[int(cam_ns[5])])
        nat.close()

    def test_threaded_prefetch_sequential_consume(self, tmp_path, so_built):
        root, images, cam_ns = make_fake_euroc(tmp_path)
        nat = NativeEurocLoader(root, prefetch_threads=2, prefetch_ahead=4)
        for k in range(nat.n_frames):
            img = nat.get_image(k)
            assert np.array_equal(img.astype(np.uint8), images[int(cam_ns[k])]), k
        nat.close()
