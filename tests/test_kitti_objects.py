"""KITTI object-mapping eval harness: loaders + PR protocol on synthetic
KITTI-format fixtures (no dataset in this environment; the formats are exact).
"""
import math
import os

import numpy as np
import pytest

from orcvio_tpu.eval.kitti_objects import (
    KittiObjectEvaluator,
    FrameCuboids,
    aggregate_pr,
    bev_iou_corners,
    detection_frame_cuboids,
    load_raw_calib,
    oxts_to_poses,
    parse_detection_labels,
    parse_tracklet_xml,
    pr_markdown,
    project_cuboid_bbox,
    tracklet_frame_cuboids,
    _box_corners,
)

TRACKLET_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes" ?>
<boost_serialization signature="serialization::archive" version="9">
<tracklets class_id="0" tracking_level="0" version="0">
  <count>2</count>
  <item_version>1</item_version>
  <item class_id="1" tracking_level="0" version="1">
    <objectType>Car</objectType>
    <h>1.5</h><w>1.7</w><l>4.0</l>
    <first_frame>0</first_frame>
    <poses class_id="2" tracking_level="0" version="0">
      <count>2</count>
      <item_version>2</item_version>
      <item class_id="3" tracking_level="0" version="2">
        <tx>10.0</tx><ty>2.0</ty><tz>-1.0</tz>
        <rx>0</rx><ry>0</ry><rz>0.5</rz>
        <state>2</state><occlusion>0</occlusion><occlusion_kf>0</occlusion_kf>
        <truncation>0</truncation><amt_occlusion>0</amt_occlusion>
        <amt_occlusion_kf>0</amt_occlusion_kf><amt_border_l>0</amt_border_l>
        <amt_border_r>0</amt_border_r><amt_border_kf>0</amt_border_kf>
      </item>
      <item>
        <tx>10.5</tx><ty>2.1</ty><tz>-1.0</tz>
        <rx>0</rx><ry>0</ry><rz>0.5</rz>
        <state>2</state><occlusion>0</occlusion><occlusion_kf>0</occlusion_kf>
        <truncation>0</truncation><amt_occlusion>0</amt_occlusion>
        <amt_occlusion_kf>0</amt_occlusion_kf><amt_border_l>0</amt_border_l>
        <amt_border_r>0</amt_border_r><amt_border_kf>0</amt_border_kf>
      </item>
    </poses>
    <finished>1</finished>
  </item>
  <item>
    <objectType>Pedestrian</objectType>
    <h>1.8</h><w>0.6</w><l>0.6</l>
    <first_frame>1</first_frame>
    <poses>
      <count>1</count>
      <item_version>2</item_version>
      <item>
        <tx>5.0</tx><ty>-3.0</ty><tz>-1.0</tz>
        <rx>0</rx><ry>0</ry><rz>0.0</rz>
        <state>2</state><occlusion>0</occlusion><occlusion_kf>0</occlusion_kf>
        <truncation>0</truncation><amt_occlusion>0</amt_occlusion>
        <amt_occlusion_kf>0</amt_occlusion_kf><amt_border_l>0</amt_border_l>
        <amt_border_r>0</amt_border_r><amt_border_kf>0</amt_border_kf>
      </item>
    </poses>
    <finished>1</finished>
  </item>
</tracklets>
</boost_serialization>
"""

DET_LABEL = (
    "Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 "
    "-0.65 1.71 46.70 -1.59\n"
    "Cyclist 0.00 3 -2.46 665.45 160.00 717.93 217.99 1.72 0.47 1.65 "
    "2.45 1.35 22.10 -2.35\n"
)


class TestLoaders:
    def test_tracklet_xml(self, tmp_path):
        p = tmp_path / "tracklet_labels.xml"
        p.write_text(TRACKLET_XML)
        trs = parse_tracklet_xml(str(p))
        assert len(trs) == 2
        car = trs[0]
        assert car.object_type == "Car" and car.poses.shape == (2, 6)
        assert car.h == 1.5 and car.first_frame == 0
        assert np.allclose(car.poses[1, :3], [10.5, 2.1, -1.0])

    def test_tracklet_cuboids_world(self, tmp_path):
        p = tmp_path / "tracklet_labels.xml"
        p.write_text(TRACKLET_XML)
        trs = parse_tracklet_xml(str(p))
        T_w_imu = np.tile(np.eye(4), (2, 1, 1))
        T_w_imu[1, :3, 3] = [1.0, 0.0, 0.0]  # vehicle moved 1 m
        per = tracklet_frame_cuboids(trs, T_w_imu, np.eye(4), classes=("Car",))
        assert set(per.keys()) == {0, 1}
        c0 = per[0]
        assert c0.corners.shape == (1, 8, 3)
        # center at the tracklet translation + half-height offset
        ctr = c0.corners[0].mean(0)
        assert np.allclose(ctr[:2], [10.0, 2.0], atol=1e-6)
        assert abs(c0.yaw[0] - 0.5) < 1e-9
        assert abs(c0.volume[0] - 1.5 * 1.7 * 4.0) < 1e-9
        # frame 1: vehicle motion shifts the world position
        assert np.allclose(per[1].corners[0].mean(0)[:2], [11.5, 2.1], atol=1e-6)

    def test_detection_labels(self, tmp_path):
        p = tmp_path / "000000.txt"
        p.write_text(DET_LABEL)
        labels = parse_detection_labels(str(p))
        assert len(labels) == 2 and labels[0].cls_type == "Car"
        assert labels[0].h == 1.65 and labels[0].ry == -1.59
        fc = detection_frame_cuboids(labels, np.eye(4))
        assert fc.corners.shape == (1, 8, 3)  # only the Car kept
        assert abs(fc.yaw[0] - (-(-1.59) + math.pi / 2)) < 1e-9

    def test_oxts_poses(self):
        lat0 = 49.0
        lla = np.array([[lat0, 8.43, 110.0],
                        [lat0 + 1e-5, 8.43, 110.0]])  # ~1.11 m north
        rpy = np.zeros((2, 3))
        rpy[1, 2] = 0.3  # yaw
        T = oxts_to_poses(lla, rpy)
        assert np.allclose(T[0], np.eye(4))
        assert abs(T[1, 1, 3] - 1.11) < 0.05 and abs(T[1, 0, 3]) < 1e-6
        assert abs(T[1, 0, 0] - math.cos(0.3)) < 1e-9

    def test_raw_calib(self, tmp_path):
        (tmp_path / "calib_imu_to_velo.txt").write_text(
            "calib_time: x\nR: 1 0 0 0 1 0 0 0 1\nT: 0.1 0.2 0.3\n")
        (tmp_path / "calib_velo_to_cam.txt").write_text(
            "calib_time: x\nR: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n")
        (tmp_path / "calib_cam_to_cam.txt").write_text(
            "R_rect_00: 1 0 0 0 1 0 0 0 1\n"
            "P_rect_00: 700 0 600 0 0 700 180 0 0 0 1 0\n")
        cal = load_raw_calib(str(tmp_path))
        assert np.allclose(cal.T_velo_imu[:3, 3], [0.1, 0.2, 0.3])
        assert cal.K[0, 0] == 700 and cal.K[0, 2] == 600
        v = cal.T_cam0_velo[:3, :3] @ np.array([1.0, 0, 0])
        assert np.allclose(v, [0, 0, 1])  # velo x (forward) -> cam z


class TestProtocol:
    def _gt(self):
        box = _box_corners(1.5, 1.7, 4.0)
        c1 = box + np.array([10.0, 2.0, 0.0])
        yaw2 = 0.8
        R = np.array([[math.cos(yaw2), -math.sin(yaw2), 0],
                      [math.sin(yaw2), math.cos(yaw2), 0], [0, 0, 1]])
        c2 = box @ R.T + np.array([-5.0, 7.0, 0.0])
        return {0: FrameCuboids(np.stack([c1, c2]),
                                np.asarray([0.0, yaw2]),
                                np.asarray([10.2, 10.2]))}

    def test_pr_counts(self):
        gt = self._gt()
        ev = KittiObjectEvaluator(gt)
        box = _box_corners(1.5, 1.7, 4.0)
        # pred 1: 0.3 m off, 10 deg yaw error -> counts in every cell
        p1 = box + np.array([10.3, 2.0, 0.0])
        # pred 2: 1.2 m off, 40 deg yaw error -> pos<=1.5 only, rot 45/inf
        yaw2 = 0.8 + math.radians(40)
        R = np.array([[math.cos(yaw2), -math.sin(yaw2), 0],
                      [math.sin(yaw2), math.cos(yaw2), 0], [0, 0, 1]])
        p2 = box @ R.T + np.array([-5.0, 7.0 + 1.2, 0.0])
        yaw1 = math.radians(10)
        ev.add_frame(0, np.stack([p1, p2]), np.asarray([yaw1, yaw2]))
        r = ev.result()
        assert r.gt_num == 2 and r.pred_num == 2
        # tpc[rot][pos]: rows 30/45/inf, cols 0.5/1.0/1.5
        expect = np.array([[1, 1, 1], [1, 1, 2], [1, 1, 2]], float)
        np.testing.assert_allclose(r.tpc, expect)

    def test_2d_gating_drops_unseen_gt(self):
        gt = self._gt()
        ev = KittiObjectEvaluator(gt)
        box = _box_corners(1.5, 1.7, 4.0)
        p1 = box + np.array([10.05, 2.0, 0.0])
        # camera at origin looking +x (world) via a simple cam pose
        T_cam_w = np.eye(4)
        # cam frame: x right (world -y), y down (world -z), z fwd (world +x)
        T_cam_w[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
        K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
        gt_box = project_cuboid_bbox(gt[0].corners[0], T_cam_w, K)
        assert gt_box is not None
        # detection overlapping GT 1 only -> GT 2 is dropped from counts
        ev.add_frame(0, p1[None], np.asarray([0.0]),
                     pred_bbox2d=gt_box[None], T_cam_w=T_cam_w, K=K)
        r = ev.result()
        assert r.gt_num == 1 and r.tpc[2, 0] == 1

    def test_bev_iou_and_aggregate(self):
        box = _box_corners(1.5, 1.7, 4.0)
        assert abs(bev_iou_corners(box, box) - 1.0) < 1e-6
        half = bev_iou_corners(box, box + np.array([2.0, 0.0, 0.0]))
        assert abs(half - 1.0 / 3.0) < 1e-6  # half-length shift of a 4 m box
        gt = self._gt()
        ev = KittiObjectEvaluator(gt)
        ev.add_frame(0, gt[0].corners, gt[0].yaw)
        agg = aggregate_pr([ev.result(), ev.result()])
        assert agg["gt_num"] == 4 and np.all(agg["recall"] == 1.0)
        md = pr_markdown(agg)
        assert "1.000" in md and "GT objects: 4" in md
