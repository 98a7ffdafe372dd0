"""Object config ingestion, 3D IoU / PR evaluation, persistence round trips."""
import math
import os

import numpy as np
import pytest

from orcvio_tpu.config.objects_yaml import load_object_config
from orcvio_tpu.eval.objects import iou_3d, match_and_mean_iou, precision_recall_table, yaw_of_pose
from orcvio_tpu.objects.persistence import load_object_state, save_object_state

REF_OBJ_CFG = "/root/reference/config/object_feat_unity.yaml"


class TestObjectConfig:
    @pytest.mark.skipif(not os.path.exists(REF_OBJ_CFG), reason="reference configs not mounted")
    def test_load_unity(self):
        classes = load_object_config(REF_OBJ_CFG)
        car = classes["car"]
        assert car.keypoints_num == 12
        assert car.keypoints_mean_np.shape == (12, 3)
        # first keypoint x from the yaml flat list
        assert car.keypoints_mean_np[0, 0] == pytest.approx(-0.568)
        assert car.keypoints_mean_np[0, 1] == pytest.approx(-0.253)
        assert tuple(car.mean_shape) == (1.6, 3.9, 1)
        # aliases resolve to the same config
        assert classes["truck"] is car
        assert classes["door"].keypoints_num == 4


class TestIou3d:
    def test_identical(self):
        s = (1.5, 1.8, 4.5)
        assert iou_3d(s, (0, 0, 0), 0.3, s, (0, 0, 0), 0.3) == pytest.approx(1.0)

    def test_disjoint(self):
        s = (1.5, 1.8, 4.5)
        assert iou_3d(s, (0, 0, 0), 0.0, s, (100, 0, 0), 0.0) == 0.0

    def test_axis_aligned_half_overlap(self):
        # unit cubes offset by half along x: inter = 0.5, union = 1.5
        s = (1.0, 1.0, 1.0)
        iou = iou_3d(s, (0, 0, 0), 0.0, s, (0.5, 0, 0), 0.0)
        assert iou == pytest.approx(0.5 / 1.5, abs=1e-9)

    def test_rotated_overlap(self):
        # square vs itself rotated 45 deg: intersection is a regular octagon
        s = (1.0, 2.0, 2.0)
        iou = iou_3d(s, (0, 0, 0), 0.0, s, (0, 0, 0), math.pi / 4)
        inter = 8 * (math.sqrt(2) - 1)  # octagon area for side-2 square
        expect = inter / (4 + 4 - inter)
        assert iou == pytest.approx(expect, abs=1e-6)

    def test_height_mismatch(self):
        iou = iou_3d((1.0, 1, 1), (0, 0, 0), 0.0, (2.0, 1, 1), (0, 0, 0), 0.0)
        # inter vol = 1*1*min(1,2)=1; union = 1 + 2 - 1 = 2
        assert iou == pytest.approx(0.5)


class TestMatching:
    def test_match_and_mean_iou(self):
        gt = [
            dict(t=np.array([0.0, 0, 0]), yaw=0.1, shape=(1.5, 1.8, 4.0)),
            dict(t=np.array([10.0, 0, 0]), yaw=-0.2, shape=(1.5, 1.8, 4.0)),
        ]
        est = [
            dict(t=np.array([0.2, 0.1, 0]), yaw=0.12, shape=(1.4, 1.7, 4.1)),
            dict(t=np.array([10.1, -0.1, 0]), yaw=-0.25, shape=(1.6, 1.9, 3.8)),
            dict(t=np.array([50.0, 0, 0]), yaw=0.0, shape=(1.5, 1.8, 4.0)),  # spurious
        ]
        mean_iou, n, pairs = match_and_mean_iou(est, gt)
        assert n == 2
        assert mean_iou > 0.5

    def test_pr_table(self):
        gt_t = [np.array([0.0, 0, 0]), np.array([5.0, 0, 0])]
        pred_t = [np.array([0.3, 0, 0]), np.array([6.2, 0, 0])]
        gt_yaw = [0.0, 0.5]
        pred_yaw = [0.1, 0.5]
        tab = precision_recall_table(gt_t, gt_yaw, pred_t, pred_yaw)
        assert tab[(0.5, math.inf)] == pytest.approx(0.5)  # only first within 0.5 m
        assert tab[(1.5, math.inf)] == pytest.approx(1.0)
        assert tab[(0.5, 30.0)] == pytest.approx(0.5)

    def test_yaw_of_pose(self):
        from orcvio_tpu.math import so3
        import jax.numpy as jnp

        T = np.eye(4)
        T[:3, :3] = np.asarray(so3.exp(jnp.asarray([0.0, 0.0, 0.7])))
        assert yaw_of_pose(T) == pytest.approx(0.7)


class TestPersistence:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        wTq = np.eye(4)
        wTq[:3, 3] = [1, 2, 3]
        kps = rng.normal(size=(12, 3))
        shape = np.array([1.6, 3.9, 1.0])
        path = save_object_state(str(tmp_path / "object_state_%d.txt"), 7, "car", wTq, kps, shape, [1.5, 2.5])
        d = load_object_state(path)
        assert d["object_id"] == 7
        assert d["object_class"] == "car"
        assert np.allclose(d["wTq"], wTq)
        assert np.allclose(d["kps_global"], kps, atol=1e-6)
        assert np.allclose(d["ellipsoid_shape"], shape)
        assert d["timestamps"] == [1.5, 2.5]


class TestPlots:
    def test_trajectory_and_object_map_figures(self, tmp_path):
        """Visualization layer (eval/plots.py — visualize.hpp analogue)."""
        import numpy as np

        from orcvio_tpu.eval.plots import plot_object_map, plot_trajectory

        t = np.linspace(0, 10, 50)
        p = np.stack([np.cos(t), np.sin(t), 0.1 * t], axis=1)
        f1 = plot_trajectory(str(tmp_path / "traj.png"), t, p, p_gt=p + 0.01)
        objs = [dict(t=[1.0, 2.0, 0.0], yaw=0.4, shape=[1.6, 0.8, 0.7])]
        f2 = plot_object_map(str(tmp_path / "map.png"), objs, gt_objects=objs,
                             p_est=p)
        import os

        assert os.path.getsize(f1) > 5000 and os.path.getsize(f2) > 5000
