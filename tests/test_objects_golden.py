"""Object residual/Jacobian golden tests against the reference's HDF5 fixtures
(src/tests/data/*.h5, plain tensors exported from the original Python
prototype — the same goldens test_object_lm.cpp checks against), plus
autodiff cross-checks of every analytic Jacobian."""
import os

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.math import se3
from orcvio_tpu.objects import residuals as R

DATA = "/root/reference/src/tests/data"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA), reason="reference fixtures not mounted")


def load(name):
    out = {}
    with h5py.File(f"{DATA}/{name}.h5") as h:
        for k in h.keys():
            out[k] = np.asarray(h[k])
    return out


class TestFeatureQuadricGolden:
    def setup_method(self, _):
        d = load("test_error_feature_quadric")
        self.cTw = jnp.asarray(d["S"])
        self.wTo = jnp.asarray(d["T"])
        self.kps_h = jnp.asarray(d["M"])  # (12, 4) homogeneous object-frame kps
        self.kps = self.kps_h[:, :3] / self.kps_h[:, 3:4]
        self.zs = jnp.asarray(d["zs"])  # (12, 2)
        self.err_gold = np.asarray(d["error"]).reshape(-1)  # (24,)
        self.jac_gold = np.asarray(d["jacobian"])  # (24, 45)

    def test_residual_matches(self):
        r = R.feature_residual(
            self.wTo, self.kps, self.cTw[None], self.zs[None], jnp.ones((1, 12), bool)
        )
        assert np.allclose(np.asarray(r[0]).reshape(-1), self.err_gold, atol=1e-9)

    def test_jacobian_matches(self):
        Jp, Jk, Jc = R.feature_jacobians(
            self.wTo, self.kps, self.cTw[None], jnp.ones((1, 12), bool), use_left=True
        )
        # assemble (24, 45)
        J = np.zeros((24, 45))
        J[:, :6] = np.asarray(Jp[0]).reshape(24, 6)
        for k in range(12):
            J[2 * k : 2 * k + 2, 9 + 3 * k : 12 + 3 * k] = np.asarray(Jk[0, k])
        assert np.allclose(J, self.jac_gold, atol=1e-8), np.abs(J - self.jac_gold).max()

    def test_camera_jacobian_autodiff(self):
        for left in [True, False]:
            _, _, Jc = R.feature_jacobians(
                self.wTo, self.kps, self.cTw[None], jnp.ones((1, 12), bool), use_left=left
            )

            def f(xi, left=left):
                wTc = se3.inverse_pose(self.cTw)
                wTc2 = se3.exp(xi) @ wTc if left else wTc @ se3.exp(xi)
                return R.feature_residual(
                    self.wTo, self.kps, se3.inverse_pose(wTc2)[None], self.zs[None],
                    jnp.ones((1, 12), bool),
                )

            Jn = jax.jacobian(f)(jnp.zeros(6))
            assert np.allclose(np.asarray(Jc[0]), np.asarray(Jn[0]), atol=1e-7), left


class TestBBoxQuadricGolden:
    def setup_method(self, _):
        d = load("test_error_bbox_quadric")
        self.cTw = jnp.asarray(d["S"])
        self.wTo = jnp.asarray(d["T"])
        self.v = jnp.asarray(d["v"])  # ellipsoid shape
        self.zb = jnp.asarray(d["zb"]).reshape(-1)  # (4,)
        self.err_gold = np.asarray(d["error"]).reshape(-1)  # (4,)
        self.jac_gold = np.asarray(d["jacobian"])  # (4, 45)

    def test_residual_matches_old(self):
        r = R.bbox_residual(
            self.wTo, self.v, self.cTw[None], self.zb[None], jnp.ones(1, bool), use_new=False
        )
        assert np.allclose(np.asarray(r[0]), self.err_gold, atol=1e-7), (
            np.asarray(r[0]), self.err_gold
        )

    def test_jacobian_matches_old(self):
        Jp, Js, Jc = R.bbox_jacobians(
            self.wTo, self.v, self.cTw[None], self.zb[None], jnp.ones(1, bool),
            use_left=True, use_new=False,
        )
        J = np.zeros((4, 45))
        J[:, :6] = np.asarray(Jp[0])
        J[:, 6:9] = np.asarray(Js[0])
        assert np.allclose(J, self.jac_gold, atol=1e-6), np.abs(J - self.jac_gold).max()

    @pytest.mark.parametrize("left", [True, False])
    @pytest.mark.parametrize("new", [True, False])
    def test_jacobians_autodiff(self, left, new):
        Jp, Js, Jc = R.bbox_jacobians(
            self.wTo, self.v, self.cTw[None], self.zb[None], jnp.ones(1, bool),
            use_left=left, use_new=new,
        )

        def f_pose(xi):
            wTo2 = se3.exp(xi) @ self.wTo if left else self.wTo @ se3.exp(xi)
            return R.bbox_residual(wTo2, self.v, self.cTw[None], self.zb[None], jnp.ones(1, bool), new)

        def f_shape(dv):
            return R.bbox_residual(self.wTo, self.v + dv, self.cTw[None], self.zb[None], jnp.ones(1, bool), new)

        def f_cam(xi):
            wTc = se3.inverse_pose(self.cTw)
            wTc2 = se3.exp(xi) @ wTc if left else wTc @ se3.exp(xi)
            return R.bbox_residual(self.wTo, self.v, se3.inverse_pose(wTc2)[None], self.zb[None], jnp.ones(1, bool), new)

        Jp_n = jax.jacobian(f_pose)(jnp.zeros(6))[0]
        Js_n = jax.jacobian(f_shape)(jnp.zeros(3))[0]
        Jc_n = jax.jacobian(f_cam)(jnp.zeros(6))[0]
        assert np.allclose(np.asarray(Jp[0]), np.asarray(Jp_n), atol=1e-6), f"pose left={left} new={new}"
        assert np.allclose(np.asarray(Js[0]), np.asarray(Js_n), atol=1e-6), f"shape left={left} new={new}"
        assert np.allclose(np.asarray(Jc[0]), np.asarray(Jc_n), atol=1e-6), f"cam left={left} new={new}"


class TestRegularizersGolden:
    def test_deform(self):
        d = load("test_error_deform_reg")
        kps = jnp.asarray(d["M"])[:, :3] / jnp.asarray(d["M"])[:, 3:4]
        mean = jnp.asarray(d["Mhat"])
        r = R.deform_residual(kps, mean, jnp.ones(1, bool))
        assert np.allclose(np.asarray(r[0]).reshape(-1), np.asarray(d["error"]).reshape(-1), atol=1e-9)
        # jacobian: identity blocks on keypoint columns
        jac_gold = np.asarray(d["jacobian"])  # (36, 45)
        J = np.zeros((36, 45))
        for k in range(12):
            J[3 * k : 3 * k + 3, 9 + 3 * k : 12 + 3 * k] = np.eye(3)
        assert np.allclose(J, jac_gold, atol=1e-12)

    def test_shape_reg(self):
        d = load("test_error_mean_shape_reg")
        r = R.shape_residual(jnp.asarray(d["v"]), jnp.asarray(d["mean_v"]), jnp.ones(1, bool))
        assert np.allclose(np.asarray(r[0]), np.asarray(d["error"]).reshape(-1), atol=1e-12)
        jac_gold = np.asarray(d["jacobian"])
        J = np.zeros((3, 45))
        J[:, 6:9] = np.eye(3)
        assert np.allclose(J, jac_gold, atol=1e-12)
