"""Math substrate tests: mirror of the reference's test_se3.cpp strategy —
analytic results vs numerical differentiation (the reference uses
EigenNumericalDiff; here jax.jacobian / finite differences)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.math import linalg, quat, se3, so3

RNG = np.random.default_rng(0)


def rand_w(scale=1.0, batch=()):
    return jnp.asarray(RNG.normal(size=batch + (3,)) * scale)


class TestSO3:
    def test_hat_vee(self):
        w = rand_w(batch=(5,))
        assert jnp.allclose(so3.vee(so3.hat(w)), w)
        # skew-symmetry
        W = so3.hat(w)
        assert jnp.allclose(W, -jnp.swapaxes(W, -1, -2))

    def test_exp_log_roundtrip(self):
        for scale in [1e-8, 1e-4, 0.5, 2.0, 3.1]:
            w = rand_w(scale=1.0)
            w = w / jnp.linalg.norm(w) * scale  # |w| <= pi so log is unique
            R = so3.exp(w)
            assert jnp.allclose(R @ R.T, jnp.eye(3), atol=1e-12)
            assert jnp.allclose(so3.log(R), w, atol=1e-7), scale

    def test_log_near_pi(self):
        axis = np.array([1.0, 0.0, 0.0])
        w = jnp.asarray(axis * (np.pi - 1e-9))
        R = so3.exp(w)
        w2 = so3.log(R)
        assert jnp.allclose(jnp.abs(w2), jnp.abs(w), atol=1e-6)

    def test_log_f32_drifted_rotation(self):
        """f32 products of rotations drift off the manifold (trace slightly
        over 3); log must stay finite and near-correct, not 0/0 -> NaN
        (regression: gauge stitching in parallel/temporal.py)."""
        R = np.array(
            [[9.9999940e-01, -2.9419234e-04, 5.6829798e-05],
             [2.9405658e-04, 1.0000002e+00, -6.8940601e-05],
             [-5.6558350e-05, 6.8991991e-05, 1.0000008e+00]], np.float32)
        w = so3.log(jnp.asarray(R, jnp.float32))
        assert jnp.isfinite(w).all()
        assert jnp.allclose(w, jnp.asarray([6.9e-5, 5.7e-5, 2.94e-4]),
                            atol=2e-6)
        # exactly-identity input (trace == 3 in f32)
        w0 = so3.log(jnp.eye(3, dtype=jnp.float32))
        assert jnp.isfinite(w0).all() and jnp.allclose(w0, 0.0)

    def test_left_jacobian_identity(self):
        # exp(w + Jl_inv... ) identity: exp(w + d) ~= exp(Jl(w) d) exp(w)
        w = rand_w(scale=0.7)
        d = rand_w(scale=1e-6)
        lhs = so3.exp(w + d)
        rhs = so3.exp(jnp.einsum("ij,j->i", so3.left_jacobian(w), d)) @ so3.exp(w)
        assert jnp.allclose(lhs, rhs, atol=1e-10)

    def test_left_jacobian_small_angle_smooth(self):
        for scale in [0.0, 1e-9, 1e-6, 1e-5, 2e-5]:
            w = jnp.asarray([scale, 0.0, 0.0])
            J = so3.left_jacobian(w)
            assert jnp.all(jnp.isfinite(J))
        # gradient finite through the small-angle branch
        g = jax.grad(lambda w: jnp.sum(so3.left_jacobian(w)))(jnp.zeros(3))
        assert jnp.all(jnp.isfinite(g))

    def test_hl_integral_identity(self):
        # Hl(w) == int_0^1 s * Jl(s*w) ds  (reference Hl_operator, math_utils.hpp:230)
        w = rand_w(scale=1.3)
        s = jnp.linspace(0, 1, 20001)[:, None]
        integrand = s[..., None] * so3.left_jacobian(s * w[None, :])
        numeric = jnp.trapezoid(integrand, dx=1.0 / 20000, axis=0)
        assert jnp.allclose(so3.Hl(w), numeric, atol=1e-8)

    def test_jl_inv(self):
        w = rand_w(scale=1.1)
        assert jnp.allclose(so3.left_jacobian(w) @ so3.left_jacobian_inv(w), jnp.eye(3), atol=1e-10)


class TestQuat:
    def test_multiply_matches_rotation_composition(self):
        q1 = quat.normalize(jnp.asarray(RNG.normal(size=4)))
        q2 = quat.normalize(jnp.asarray(RNG.normal(size=4)))
        R = quat.to_rotation(quat.multiply(q1, q2))
        assert jnp.allclose(R, quat.to_rotation(q1) @ quat.to_rotation(q2), atol=1e-12)

    def test_from_rotation_roundtrip(self):
        for _ in range(20):
            q = quat.normalize(jnp.asarray(RNG.normal(size=4)))
            q = jnp.where(q[3] < 0, -q, q)
            assert jnp.allclose(quat.from_rotation(quat.to_rotation(q)), q, atol=1e-10)
        # near-pi rotations exercise every Shepperd branch
        for axis in np.eye(3):
            R = so3.exp(jnp.asarray(axis * (np.pi - 1e-7)))
            q = quat.from_rotation(R)
            assert jnp.allclose(quat.to_rotation(q), R, atol=1e-9)

    def test_small_angle(self):
        d = rand_w(scale=1e-4)
        assert jnp.allclose(quat.to_rotation(quat.from_small_angle(d)), so3.exp(d), atol=1e-8)

    def test_exp_consistency(self):
        w = rand_w(scale=0.8)
        # quaternion for rotation exp(w): axis-angle
        theta = jnp.linalg.norm(w)
        q = jnp.concatenate([w / theta * jnp.sin(theta / 2), jnp.cos(theta / 2)[None]])
        assert jnp.allclose(quat.to_rotation(q), so3.exp(w), atol=1e-12)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=6))
        T = se3.exp(xi)
        assert jnp.allclose(se3.log(T), xi, atol=1e-9)
        assert jnp.allclose(T @ se3.inverse_pose(T), jnp.eye(4), atol=1e-12)

    def test_odot_identity(self):
        # d/dxi [exp(xi^) p] at xi=0 == odot(p)
        p = jnp.asarray(RNG.normal(size=4).tolist()[:3] + [1.0])
        J = jax.jacobian(lambda xi: (se3.exp(xi) @ p))(jnp.zeros(6))
        assert jnp.allclose(J, se3.odot(p), atol=1e-9)

    def test_circled_circ_structure(self):
        p = jnp.asarray([1.0, 2.0, 3.0, 1.0])
        C = se3.circled_circ(p)
        assert C.shape == (6, 4)
        assert jnp.allclose(C[:3, 3], p[:3])
        assert jnp.allclose(C[3:, :3], -so3.hat(p[:3]))
        # adjoint-style identity: (xi^ p) = circled_circ(p)^T-free check:
        # odot(p) xi == [xi^] p for twist matrix
        xi = jnp.asarray(RNG.normal(size=6))
        xihat = jnp.zeros((4, 4)).at[:3, :3].set(so3.hat(xi[3:])).at[:3, 3].set(xi[:3])
        assert jnp.allclose(xihat @ p, se3.odot(p) @ xi, atol=1e-12)

    def test_project_df(self):
        x = jnp.asarray([0.3, -0.2, 2.0])
        J = jax.jacobian(se3.project_image)(x)
        assert jnp.allclose(J, se3.project_image_df(x), atol=1e-12)

    def test_project_object_points_df_object(self):
        P = jnp.asarray(np.hstack([np.eye(3), np.zeros((3, 1))]))
        wTo = se3.exp(jnp.asarray(RNG.normal(size=6) * 0.3))
        pts = jnp.asarray(RNG.normal(size=(5, 3)))
        pts_h = se3.to_homogeneous(pts + jnp.asarray([0.0, 0.0, 5.0]))
        for left in [True, False]:
            J = se3.project_object_points_df_object(P, wTo, pts_h, left)
            if left:
                f = lambda xi: se3.project_object_points(P, se3.exp(xi) @ wTo, pts_h)
            else:
                f = lambda xi: se3.project_object_points(P, wTo @ se3.exp(xi), pts_h)
            J_num = jax.jacobian(f)(jnp.zeros(6))
            assert jnp.allclose(J, J_num, atol=1e-9), f"left={left}"

    def test_project_object_points_df_camera(self):
        K = jnp.asarray(np.hstack([np.eye(3), np.zeros((3, 1))]))
        cTw = se3.exp(jnp.asarray(RNG.normal(size=6) * 0.2))
        wTo = se3.exp(jnp.asarray(RNG.normal(size=6) * 0.2))
        pts_h = se3.to_homogeneous(jnp.asarray(RNG.normal(size=(4, 3))) + jnp.asarray([0, 0, 6.0]))
        P = K @ cTw
        # Convention (se3_ops.hpp:431): the perturbation applies to the camera
        # pose wTc = inv(cTw): left flag -> wTc' = exp(xi) wTc, i.e.
        # cTw' = cTw exp(-xi); right flag -> wTc' = wTc exp(xi), i.e.
        # cTw' = exp(-xi) cTw.
        for left in [True, False]:
            J = se3.project_object_points_df_camera(P, wTo, cTw, pts_h, left)
            if left:
                f = lambda xi: se3.project_object_points(K @ cTw @ se3.exp(-xi), wTo, pts_h)
            else:
                f = lambda xi: se3.project_object_points(K @ se3.exp(-xi) @ cTw, wTo, pts_h)
            J_num = jax.jacobian(f)(jnp.zeros(6))
            assert jnp.allclose(J, J_num, atol=1e-8), f"left={left}"

    def test_cam_wrt_imu_jacobian(self):
        """Verify get_cam_wrt_imu_se3_jacobian (se3_ops.hpp:531) numerically.

        Input is the filter clone error state e = [dtheta, dp] with
        p' = p + dp and R' = exp(dtheta) R (left flag) / R exp(dtheta) (right
        flag); output is the camera twist xi_c = [rho, phi] such that
        wTc' = exp(xi_c) wTc (left) / wTc exp(xi_c) (right), where
        wTc = wTi @ iTc, iTc = (R_b2c^T, t_c_b).
        """
        R_b2c = so3.exp(jnp.asarray(RNG.normal(size=3) * 0.4))
        t_c_b = jnp.asarray(RNG.normal(size=3))
        wTi = se3.exp(jnp.asarray(RNG.normal(size=6)))
        iTc = se3.make_pose(R_b2c.T, t_c_b)
        wTc = wTi @ iTc
        R_w2c = wTc[:3, :3].T
        t_b_w = wTi[:3, 3]
        R_i, p_i = wTi[:3, :3], wTi[:3, 3]

        for left in [True, False]:
            J = se3.get_cam_wrt_imu_se3_jacobian(R_b2c, t_c_b, R_w2c, t_b_w, left)

            def cam_twist(e, left=left):
                dtheta, dp = e[:3], e[3:]
                if left:
                    wTi_p = se3.make_pose(so3.exp(dtheta) @ R_i, p_i + dp)
                    return se3.log(wTi_p @ iTc @ se3.inverse_pose(wTc))
                wTi_p = se3.make_pose(R_i @ so3.exp(dtheta), p_i + dp)
                return se3.log(se3.inverse_pose(wTc) @ wTi_p @ iTc)

            J_num = jax.jacobian(cam_twist)(jnp.zeros(6))
            assert jnp.allclose(J, J_num, atol=1e-6), f"left={left}"


class TestLinalg:
    def test_nullspace_project(self):
        m, k, d = 12, 3, 8
        H_f = jnp.asarray(RNG.normal(size=(m, k)))
        H_x = jnp.asarray(RNG.normal(size=(m, d)))
        r = jnp.asarray(RNG.normal(size=m))
        H_x_p, r_p = linalg.nullspace_project(H_f, H_x, r)
        assert H_x_p.shape == (m, d)
        # projected rows lie in left-nullspace of H_f: A^T H_f = 0 means the
        # reconstructed residual is unexplained by feature error. Verify by
        # checking information content matches: H_x' and r' satisfy
        # H_x'^T H_x' == H_x^T N H_x where N is the nullspace projector.
        Q, _ = np.linalg.qr(np.asarray(H_f), mode="complete")
        A = Q[:, k:]
        N_proj = A @ A.T
        assert np.allclose(np.asarray(H_x_p.T @ H_x_p), np.asarray(H_x).T @ N_proj @ np.asarray(H_x), atol=1e-9)
        assert np.allclose(np.asarray(H_x_p.T @ r_p), np.asarray(H_x).T @ N_proj @ np.asarray(r), atol=1e-9)

    def test_nullspace_project_masked_rows(self):
        """Padded zero rows must not change the projected information."""
        m, k, d = 9, 3, 6
        H_f_v = RNG.normal(size=(m, k))
        H_x_v = RNG.normal(size=(m, d))
        r_v = RNG.normal(size=m)
        # padded variant: 4 extra zero rows
        pad = 4
        H_f_p = np.vstack([H_f_v, np.zeros((pad, k))])
        H_x_p = np.vstack([H_x_v, np.zeros((pad, d))])
        r_p = np.concatenate([r_v, np.zeros(pad)])
        Hx1, r1 = linalg.nullspace_project(jnp.asarray(H_f_v), jnp.asarray(H_x_v), jnp.asarray(r_v))
        Hx2, r2 = linalg.nullspace_project(jnp.asarray(H_f_p), jnp.asarray(H_x_p), jnp.asarray(r_p))
        assert np.allclose(np.asarray(Hx1.T @ Hx1), np.asarray(Hx2.T @ Hx2), atol=1e-9)
        assert np.allclose(np.asarray(Hx1.T @ r1), np.asarray(Hx2.T @ r2), atol=1e-9)
        assert np.allclose(np.asarray(r1 @ r1), np.asarray(r2 @ r2), atol=1e-9)

    def test_qr_compress(self):
        m, d = 40, 10
        H = jnp.asarray(RNG.normal(size=(m, d)))
        r = jnp.asarray(RNG.normal(size=m))
        R, rc = linalg.qr_compress(H, r)
        assert R.shape == (d, d)
        assert jnp.allclose(R.T @ R, H.T @ H, atol=1e-8)
        assert jnp.allclose(R.T @ rc, H.T @ r, atol=1e-8)

    def test_chi2_table(self):
        t = linalg.chi_squared_table(0.95, 10)
        assert t.shape == (11,)
        assert abs(float(t[1]) - 3.841458) < 1e-4
        assert abs(float(t[2]) - 5.991465) < 1e-4

    def test_masked_psd_solve(self):
        m = 8
        A = RNG.normal(size=(m, m))
        S = jnp.asarray(A @ A.T + m * np.eye(m))
        b = jnp.asarray(RNG.normal(size=m))
        mask = jnp.asarray([1, 1, 1, 1, 1, 0, 0, 0], dtype=bool)
        b_m = b * mask
        x = linalg.masked_psd_solve(S, b_m, mask)
        # equals dense solve on the valid sub-block
        sub = np.ix_(range(5), range(5))
        x_ref = np.linalg.solve(np.asarray(S)[sub], np.asarray(b)[:5])
        assert np.allclose(np.asarray(x[:5]), x_ref, atol=1e-10)
        assert np.allclose(np.asarray(x[5:]), 0.0)
