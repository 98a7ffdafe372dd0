"""Multiframe object tests on the reference's one_car fixtures
(src/tests/data/one_car/frame_*.h5: 44 frames of a simulated car with
keypoint + bbox measurements and camera poses) — mirrors
test_object_init_multiframe.cpp and test_object_lm_multiframe.cpp."""
import glob
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.math import se3
from orcvio_tpu.objects.init import kabsch_umeyama, object_initialization
from orcvio_tpu.objects.lm import (
    ObjectLMConfig,
    ObjectLMData,
    ObjectLMState,
    export_for_update,
    optimize,
)

DATA = "/root/reference/src/tests/data/one_car"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA), reason="reference fixtures not mounted")


def load_one_car(dirname=DATA):
    files = sorted(glob.glob(f"{dirname}/frame_*.h5"), key=lambda f: int(f.split("_")[-1][:-3]))
    zs, zb, wTc = [], [], []
    f64 = lambda x: np.asarray(x, np.float64)
    for f in files:
        with h5py.File(f) as h:
            zs.append(f64(h["zs"]))
            if "zb" in h:
                xywh = f64(h["zb"]).reshape(-1)
                zb.append([xywh[0], xywh[1], xywh[0] + xywh[2], xywh[1] + xywh[3]])
            wTc.append(f64(h["wTo"]))  # NB: "wTo" in the fixture is the camera pose
            wTq_gt = f64(h["wTq"])
            mean_shape = f64(h["mean_shape"])
            ellipsoid = f64(h["ellipsoid_shape"]).reshape(-1)
            kps_gt = f64(h["kps_gt_3d"])
    zs = np.stack(zs)  # (T, 12, 2), NaN = invalid
    zb = np.stack(zb) if zb else np.zeros((len(files), 4))
    wTc = np.stack(wTc)
    zs_mask = np.isfinite(zs).all(axis=2)
    zs = np.nan_to_num(zs)
    return dict(
        zs=jnp.asarray(zs), zs_mask=jnp.asarray(zs_mask), zb=jnp.asarray(zb),
        has_zb=len(glob.glob(f"{dirname}/frame_0.h5")) > 0 and "zb" in h5py.File(files[0]),
        wTc=jnp.asarray(wTc), wTq_gt=jnp.asarray(wTq_gt),
        mean_shape=jnp.asarray(mean_shape), ellipsoid=jnp.asarray(ellipsoid),
        kps_gt=jnp.asarray(kps_gt),
    )


@pytest.fixture(scope="module")
def car():
    return load_one_car()


class TestKabsch:
    def test_random_rigid(self):
        rng = np.random.default_rng(0)
        from orcvio_tpu.math import so3

        src = jnp.asarray(rng.normal(size=(10, 3)))
        R = so3.exp(jnp.asarray([0.4, -0.2, 0.9]))
        t = jnp.asarray([1.0, -2.0, 3.0])
        dst = src @ R.T + t
        T = kabsch_umeyama(src, dst, jnp.ones(10, bool))
        assert np.allclose(np.asarray(T[:3, :3]), np.asarray(R), atol=1e-9)
        assert np.allclose(np.asarray(T[:3, 3]), np.asarray(t), atol=1e-9)

    def test_with_scale(self):
        rng = np.random.default_rng(1)
        from orcvio_tpu.math import so3

        src = jnp.asarray(rng.normal(size=(8, 3)))
        R = so3.exp(jnp.asarray([0.1, 0.2, -0.5]))
        s = 1.7
        dst = s * (src @ R.T) + jnp.asarray([0.5, 0.5, -1.0])
        T = kabsch_umeyama(src, dst, jnp.ones(8, bool))
        # reference embeds scale in the linear part (findTransform)
        assert np.allclose(np.asarray(T[:3, :3]) / s, np.asarray(R), atol=1e-6)
        pred = src @ T[:3, :3].T + T[:3, 3]
        assert np.allclose(np.asarray(pred), np.asarray(dst), atol=1e-6)

    def test_planar_points(self):
        # planar sets (test_kabsch.cpp:46) must still produce a valid rotation
        rng = np.random.default_rng(2)
        from orcvio_tpu.math import so3

        src = jnp.asarray(np.column_stack([rng.normal(size=(6, 2)), np.zeros(6)]))
        R = so3.exp(jnp.asarray([0.0, 0.0, 1.2]))
        dst = src @ R.T + jnp.asarray([1.0, 0.0, 0.0])
        T = kabsch_umeyama(src, dst, jnp.ones(6, bool))
        pred = src @ T[:3, :3].T + T[:3, 3]
        assert np.allclose(np.asarray(pred), np.asarray(dst), atol=1e-6)
        assert abs(float(jnp.linalg.det(T[:3, :3])) - 1.0) < 1e-6


class TestObjectInit:
    def test_one_car_init(self, car):
        cfg = FilterConfig(tri_translation_threshold=-1.0)
        R_c2w = car["wTc"][:, :3, :3]
        t_c_w = car["wTc"][:, :3, 3]
        wTq, ok, kps_w, kps_valid = object_initialization(
            cfg, car["zs"], car["zs_mask"], R_c2w, t_c_w, car["mean_shape"],
            use_ransac=True,
        )
        assert bool(ok)
        disp_r, disp_t = se3.displacement(wTq, car["wTq_gt"])
        # test_object_init_multiframe tolerance: dispt < 20% |t_gt|, rot loose
        t_norm = float(jnp.linalg.norm(car["wTq_gt"][:3, 3]))
        assert float(disp_t) < 0.2 * t_norm, (float(disp_t), t_norm)
        assert int(kps_valid.sum()) >= 4


class TestObjectLMMultiframe:
    def run_lm(self, car, lite=False, **kw):
        cfg = FilterConfig(tri_translation_threshold=-1.0)
        R_c2w = car["wTc"][:, :3, :3]
        t_c_w = car["wTc"][:, :3, 3]
        wTq0, ok, _, _ = object_initialization(
            cfg, car["zs"], car["zs_mask"], R_c2w, t_c_w, car["mean_shape"], use_ransac=True
        )
        assert bool(ok)
        # orthonormalize the (scaled) Kabsch rotation for the manifold state
        U, S, Vt = jnp.linalg.svd(wTq0[:3, :3])
        wTq0 = se3.make_pose(U @ Vt, wTq0[:3, 3])
        lmc = ObjectLMConfig(iters=30, lite=lite, **kw)
        st0 = ObjectLMState(wTo=wTq0, shape=car["ellipsoid"], kps=car["mean_shape"])
        T = car["zs"].shape[0]
        data = ObjectLMData(
            cTw=se3.inverse_pose(car["wTc"]),
            zs=car["zs"], zs_mask=car["zs_mask"],
            zb=car["zb"], zb_mask=jnp.ones(T, bool),
            frame_mask=jnp.ones(T, bool),
            kps_mean=car["mean_shape"], shape_mean=car["ellipsoid"],
        )
        st, cost, n_acc = optimize(lmc, st0, data)
        return st0, st, cost, n_acc, data, lmc

    def test_full_lm_converges_to_gt(self, car):
        st0, st, cost, n_acc, data, lmc = self.run_lm(car, lite=False)
        disp_r0, disp_t0 = se3.displacement(st0.wTo, car["wTq_gt"])
        disp_r, disp_t = se3.displacement(st.wTo, car["wTq_gt"])
        t_norm = float(jnp.linalg.norm(car["wTq_gt"][:3, 3]))
        # test_object_lm_multiframe tolerance: dispt < 5% |t_gt|
        assert float(disp_t) < 0.05 * t_norm, (float(disp_t), float(disp_t0), t_norm)
        assert int(n_acc) > 3
        assert np.isfinite(float(cost))

    def test_lite_lm_runs(self, car):
        st0, st, cost, n_acc, data, lmc = self.run_lm(car, lite=True)
        assert np.isfinite(float(cost))
        assert int(n_acc) >= 1
        # pose must not blow up
        disp_r, disp_t = se3.displacement(st.wTo, car["wTq_gt"])
        t_norm = float(jnp.linalg.norm(car["wTq_gt"][:3, 3]))
        assert float(disp_t) < 0.5 * t_norm

    def test_export_shapes_and_masks(self, car):
        st0, st, cost, n_acc, data, lmc = self.run_lm(car, lite=False)
        exp = export_for_update(lmc, st, data)
        T, K = data.zs_mask.shape
        assert exp.r_feat.shape == (T, K, 2)
        assert exp.J_obj_feat.shape == (T, K, 2, 9 + 3 * K)
        assert exp.J_cam_bbox.shape == (T, 4, 6)
        # masked rows are exact zeros
        assert np.allclose(np.asarray(exp.r_feat)[~np.asarray(data.zs_mask)], 0.0)
        assert bool(jnp.all(jnp.isfinite(exp.J_obj_feat)))

    def test_lm_reduces_cost_from_perturbed_start(self, car):
        from orcvio_tpu.math import so3

        st0, st, cost, n_acc, data, lmc = self.run_lm(car, lite=False)
        # perturb the converged state and re-optimize: should come back
        wTo_p = se3.exp(jnp.asarray([0.3, -0.2, 0.1, 0.05, -0.05, 0.08])) @ st.wTo
        stp = ObjectLMState(wTo=wTo_p, shape=st.shape, kps=st.kps)
        st2, cost2, _ = optimize(lmc, stp, data)
        disp_r, disp_t = se3.displacement(st2.wTo, st.wTo)
        assert float(disp_t) < 0.15, float(disp_t)
