"""Object pipeline tests: SORT (auction assignment vs scipy Hungarian, track
lifecycle), keypoint KF smoothing, and the full accumulate->finalize->EKF
loop on a synthetic object world."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.math import se3, so3
from orcvio_tpu.objects import residuals as RS
from orcvio_tpu.objects.kf import kf4_create, kf4_position, kf4_step
from orcvio_tpu.objects.lm import ObjectLMConfig
from orcvio_tpu.objects.manager import (
    ManagerConfig,
    ObjectTable,
    PoseHistory,
    finalize_object,
    ingest,
    rows_to_finalize,
)
from orcvio_tpu.objects.sort import SortConfig, SortState, auction_assign, iou_matrix, sort_step

RNG = np.random.default_rng(11)


class TestAssignment:
    def test_iou_matrix(self):
        a = jnp.asarray([[0.0, 0, 2, 2], [10, 10, 12, 12]])
        b = jnp.asarray([[1.0, 1, 3, 3], [10, 10, 12, 12], [20, 20, 21, 21]])
        m = np.asarray(iou_matrix(a, b))
        assert abs(m[0, 0] - 1.0 / 7.0) < 1e-6
        assert abs(m[1, 1] - 1.0) < 1e-6
        assert m[0, 2] == 0.0

    def test_auction_matches_hungarian(self):
        for trial in range(10):
            N, M = 8, 10
            benefit = RNG.uniform(0, 1, size=(N, M))
            r2c = np.asarray(
                auction_assign(jnp.asarray(benefit), jnp.ones(N, bool), jnp.ones(M, bool))
            )
            ri, ci = linear_sum_assignment(-benefit)
            opt = benefit[ri, ci].sum()
            got = sum(benefit[i, c] for i, c in enumerate(r2c) if c >= 0)
            assert got > opt - 0.05, (trial, got, opt)

    def test_auction_respects_masks(self):
        benefit = jnp.ones((3, 3))
        r2c = auction_assign(benefit, jnp.asarray([True, False, True]), jnp.asarray([True, True, False]))
        r2c = np.asarray(r2c)
        assert r2c[1] == -1
        assert 2 not in r2c[[0, 2]].tolist()


class TestSort:
    def test_track_lifecycle(self):
        sc = SortConfig(capacity=6, max_age=1, min_hits=2, iou_threshold=0.2)
        s = SortState.create(sc)
        box = np.array([10.0, 10, 30, 40])
        for k in range(5):
            b = jnp.asarray([box + [2.0 * k, 1.0 * k, 2.0 * k, 1.0 * k]], jnp.float32)
            s, out = sort_step(sc, s, b, jnp.zeros(1, jnp.int32), jnp.ones(1, bool))
        assert int(jnp.sum(out.track_id >= 0)) == 1
        assert bool(out.reported[np.argmax(np.asarray(out.track_id) >= 0)])
        tid = int(out.track_id[np.argmax(np.asarray(out.track_id) >= 0)])
        # detection disappears -> after max_age frames the track dies with lost flag
        empty = jnp.zeros((1, 4), jnp.float32)
        s, out1 = sort_step(sc, s, empty, jnp.zeros(1, jnp.int32), jnp.zeros(1, bool))
        s, out2 = sort_step(sc, s, empty, jnp.zeros(1, jnp.int32), jnp.zeros(1, bool))
        lost_ids = set(np.asarray(out1.lost_id).tolist() + np.asarray(out2.lost_id).tolist())
        assert tid in lost_ids
        assert int(jnp.sum(s.track_id >= 0)) == 0

    def test_two_objects_stable_ids(self):
        sc = SortConfig(capacity=6, max_age=2, min_hits=1, iou_threshold=0.2)
        s = SortState.create(sc)
        ids_seen = []
        for k in range(6):
            boxes = jnp.asarray(
                [[10 + 3 * k, 10, 30 + 3 * k, 40], [100, 50 + 2 * k, 130, 90 + 2 * k]], jnp.float32
            )
            s, out = sort_step(sc, s, boxes, jnp.zeros(2, jnp.int32), jnp.ones(2, bool))
            live = np.asarray(out.track_id)
            ids_seen.append(frozenset(live[live >= 0].tolist()))
        assert ids_seen[-1] == ids_seen[2]  # same two ids persist
        assert len(ids_seen[-1]) == 2


class TestKeypointKF:
    def test_smooths_noise(self):
        kf = kf4_create((1, 1), jnp.float64)
        true = np.array([5.0, 3.0])
        vel = np.array([1.0, -0.5])
        est_err = []
        raw_err = []
        for k in range(30):
            t = 0.1 * k
            z = true + vel * t + RNG.normal(size=2) * 0.1
            kf = kf4_step(kf, jnp.asarray(z)[None, None], jnp.asarray([[t]]), jnp.ones((1, 1), bool))
            if k > 10:
                est_err.append(np.linalg.norm(np.asarray(kf4_position(kf))[0, 0] - (true + vel * t)))
                raw_err.append(np.linalg.norm(z - (true + vel * t)))
        assert np.mean(est_err) < 0.8 * np.mean(raw_err)


def make_object_world(T=16, K=8, noise=1e-3, seed=2):
    rng = np.random.default_rng(seed)
    wTo_gt = se3.make_pose(so3.exp(jnp.asarray([0.05, 0.1, 0.8])), jnp.asarray([0.5, 0.2, 8.0]))
    kps_mean = jnp.asarray(rng.normal(size=(K, 3)) * 0.8)
    kps_gt = kps_mean + jnp.asarray(rng.normal(size=(K, 3)) * 0.05)
    shape_gt = jnp.asarray([1.6, 0.9, 0.7])
    # camera arc in front of the object (object stays ~7-8 m deep)
    wTc = []
    for i in range(T):
        ang = 0.04 * i
        Rc = so3.exp(jnp.asarray([0.0, ang, 0.0]))
        tc = jnp.asarray([3.0 * np.sin(ang), 0.1 * np.sin(0.5 * i), 0.5 * (1 - np.cos(ang))])
        wTc.append(se3.make_pose(Rc, tc))
    wTc = jnp.stack(wTc)
    cTw = se3.inverse_pose(wTc)
    # zs = projections of the GT object keypoints (feature_residual with z=0
    # returns the predictions) + noise
    zs = RS.feature_residual(wTo_gt, kps_gt, cTw, jnp.zeros((T, K, 2)), jnp.ones((T, K), bool))
    zs = zs + jnp.asarray(rng.normal(size=zs.shape) * noise)
    # bbox tangent to the projected GT ellipsoid (dual conic C = P Q P^T),
    # so the bbox residual is exactly zero at ground truth
    Qi = RS.ellipse_from_shape(shape_gt)
    P_o = jnp.einsum("tij,jk->tik", cTw[:, :3, :], wTo_gt)
    C = jnp.einsum("tij,jk,tlk->til", P_o, Qi, P_o)
    Cn = np.asarray(C)
    sx = np.sqrt(np.maximum(Cn[:, 0, 2] ** 2 - Cn[:, 2, 2] * Cn[:, 0, 0], 0)) / np.abs(Cn[:, 2, 2])
    sy = np.sqrt(np.maximum(Cn[:, 1, 2] ** 2 - Cn[:, 2, 2] * Cn[:, 1, 1], 0)) / np.abs(Cn[:, 2, 2])
    cx = Cn[:, 0, 2] / Cn[:, 2, 2]
    cy = Cn[:, 1, 2] / Cn[:, 2, 2]
    zb = np.stack([cx - sx, cy - sy, cx + sx, cy + sy], axis=1)
    return dict(wTo_gt=wTo_gt, kps_mean=kps_mean, kps_gt=kps_gt, shape_gt=shape_gt,
                wTc=wTc, zs=zs, zb=jnp.asarray(zb), T=T, K=K)


class TestManagerPipeline:
    def test_accumulate_and_finalize(self):
        w = make_object_world()
        T, K = w["T"], w["K"]
        mc = ManagerConfig(capacity=4, window=T, n_kps=K, pose_history=64, min_frames=6,
                           smooth_keypoints=False)
        table = ObjectTable.create(mc, jnp.float64)
        poses = PoseHistory.create(mc.pose_history, jnp.float64)
        ingest_j = jax.jit(lambda tb, t, oid, cid, bb, kp, km, v: ingest(mc, tb, t, oid, cid, bb, kp, km, v))
        for i in range(T):
            t = float(i)
            poses = poses.push(w["wTc"][i], jnp.asarray(t, jnp.float64))
            table = ingest_j(
                table, jnp.asarray(t, jnp.float64),
                jnp.asarray([7], jnp.int32), jnp.asarray([1], jnp.int32),
                w["zb"][i][None], w["zs"][i][None], jnp.ones((1, K), bool), jnp.ones(1, bool),
            )
        row = int(np.argmax(np.asarray(table.oid) == 7))
        assert int(table.n[row]) == T
        fin_mask, junk_mask = rows_to_finalize(mc, table, jnp.asarray([7], jnp.int32))
        assert bool(fin_mask[row])

        cfg = FilterConfig(tri_translation_threshold=-1.0)
        lmc = ObjectLMConfig(iters=25)
        fin, exp, wTc_obj, data = finalize_object(
            cfg, lmc,
            table.zs[row], table.zs_mask[row], table.zb[row], table.zb_mask[row],
            table.t[row], jnp.arange(mc.window) < table.n[row],
            poses, w["kps_mean"], w["shape_gt"],
        )
        assert bool(fin.ok)
        dr, dt = se3.displacement(fin.wTo, w["wTo_gt"])
        assert float(dt) < 0.3, float(dt)
        assert float(dr) < 0.1, float(dr)

    def test_smoothing_path_runs(self):
        w = make_object_world(T=10)
        K = w["K"]
        mc = ManagerConfig(capacity=2, window=10, n_kps=K, smooth_keypoints=True)
        table = ObjectTable.create(mc, jnp.float64)
        for i in range(10):
            table = ingest(
                mc, table, jnp.asarray(float(i), jnp.float64),
                jnp.asarray([3], jnp.int32), jnp.asarray([0], jnp.int32),
                w["zb"][i][None], w["zs"][i][None], jnp.ones((1, K), bool), jnp.ones(1, bool),
            )
        row = int(np.argmax(np.asarray(table.oid) == 3))
        assert int(table.n[row]) == 10
        assert bool(jnp.all(jnp.isfinite(table.zs[row])))


class TestLiteInit:
    def test_bbox_only_init_recovers_position(self):
        from orcvio_tpu.objects.init import object_initialization_lite

        # GT object at known position, identity rotation; camera at origin
        shape = jnp.asarray([1.5, 0.9, 0.7])
        wPq_gt = jnp.asarray([0.8, -0.4, 9.0])
        wTo = jnp.eye(4).at[:3, 3].set(wPq_gt)
        cTw = jnp.eye(4)
        Qi = RS.ellipse_from_shape(shape)
        P_o = (cTw[:3, :] @ wTo)[None]
        C = jnp.einsum("tij,jk,tlk->til", P_o, Qi, P_o)[0]
        sx = jnp.sqrt(C[0, 2] ** 2 - C[2, 2] * C[0, 0]) / jnp.abs(C[2, 2])
        sy = jnp.sqrt(C[1, 2] ** 2 - C[2, 2] * C[1, 1]) / jnp.abs(C[2, 2])
        cx = C[0, 2] / C[2, 2]
        cy = C[1, 2] / C[2, 2]
        zb = jnp.asarray([cx - sx, cy - sy, cx + sx, cy + sy])
        R_GtoA = jnp.eye(3)
        p_AinG = jnp.zeros(3)
        wTq, ok = object_initialization_lite(zb, R_GtoA, p_AinG, shape)
        assert bool(ok)
        err = float(jnp.linalg.norm(wTq[:3, 3] - wPq_gt))
        # bbox-only depth from the ellipsoid extent: coarse but in the ballpark
        assert err < 0.2 * float(jnp.linalg.norm(wPq_gt)), err


def test_scale_mean_shape():
    from orcvio_tpu.config.objects_yaml import scale_mean_shape

    rng = np.random.default_rng(4)
    kps = rng.normal(size=(14, 3))
    dims = (3.86, 1.6362, 1.5208)  # avg KITTI car L, W, H
    out, scales = scale_mean_shape(kps, dims, axis_map=(1, 0, 2))
    ext = out.max(axis=0) - out.min(axis=0)
    # output axis 0 (length) lives on keypoint column 1, etc.
    assert abs(ext[1] - 3.86) < 1e-9
    assert abs(ext[0] - 1.6362) < 1e-9
    assert abs(ext[2] - 1.5208) < 1e-9
