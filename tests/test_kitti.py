"""KITTI reader tests on generated fixtures."""
import os

import numpy as np
import pytest

from orcvio_tpu.dataio.kitti import (
    kitti_times_to_frame_stream,
    load_kitti_odometry,
    load_kitti_oxts,
)


def make_fake_kitti_odom(tmp_path, K_frames=6):
    seq = tmp_path / "00"
    (seq / "image_0").mkdir(parents=True)
    np.savetxt(seq / "times.txt", np.arange(K_frames) * 0.1)
    for k in range(K_frames):
        (seq / "image_0" / f"{k:06d}.png").write_bytes(b"")
    with open(seq / "calib.txt", "w") as f:
        f.write("P0: 718.856 0 607.1928 0 0 718.856 185.2157 0 0 0 1 0\n")
        f.write("P1: 718.856 0 607.1928 -386.1448 0 718.856 185.2157 0 0 0 1 0\n")
    poses = np.tile(np.hstack([np.eye(3), np.zeros((3, 1))]).reshape(-1), (K_frames, 1))
    poses[:, 3] = np.arange(K_frames) * 1.5  # translate along x
    np.savetxt(tmp_path / "00.txt", poses)
    return str(seq), str(tmp_path / "00.txt")


def make_fake_kitti_raw(tmp_path, N=10):
    drive = tmp_path / "drive"
    (drive / "oxts" / "data").mkdir(parents=True)
    with open(drive / "oxts" / "timestamps.txt", "w") as f:
        for i in range(N):
            f.write(f"2011-09-26 13:02:{25 + i * 0.01:09.6f}\n")
    rng = np.random.default_rng(0)
    for i in range(N):
        row = np.zeros(30)
        row[0:3] = [49.0, 8.4, 112.0]
        row[3:6] = [0.01, 0.02, 1.2]
        row[11:14] = [0.1, 0.2, 9.8]  # af al au
        row[17:20] = [0.01, -0.02, 0.3]  # wf wl wu
        np.savetxt(drive / "oxts" / "data" / f"{i:010d}.txt", row[None])
    return str(drive)


class TestKittiOdometry:
    def test_load(self, tmp_path):
        seq_dir, poses = make_fake_kitti_odom(tmp_path)
        s = load_kitti_odometry(seq_dir, poses)
        assert len(s.times) == 6
        assert len(s.image_paths) == 6
        assert s.K[0, 0] == pytest.approx(718.856)
        assert s.gt_T.shape == (6, 4, 4)
        assert s.gt_T[3, 0, 3] == pytest.approx(4.5)


class TestKittiRaw:
    def test_oxts(self, tmp_path):
        drive = make_fake_kitti_raw(tmp_path)
        o = load_kitti_oxts(drive)
        assert len(o.t) == 10
        assert o.t[0] == 0.0
        assert o.t[1] == pytest.approx(0.01, abs=1e-6)
        assert np.allclose(o.gyro[0], [0.01, -0.02, 0.3])
        assert np.allclose(o.acc[0], [0.1, 0.2, 9.8])

    def test_frame_binning(self, tmp_path):
        drive = make_fake_kitti_raw(tmp_path)
        o = load_kitti_oxts(drive)
        times = np.asarray([0.03, 0.06, 0.09])
        it, g, a, m = kitti_times_to_frame_stream(times, o.t, o.gyro, o.acc, slab=8)
        assert it.shape == (3, 8)
        assert m.sum() == (o.t <= 0.09 + 0.005).sum()
