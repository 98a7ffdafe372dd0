"""Propagation tests: Phi vs autodiff of the discrete error-transition map
(the reference validates Phi only implicitly; SURVEY.md §7 stage 2 calls for
this check), plus analytic mean-propagation cases and mask no-op semantics."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.filter import propagation as prop
from orcvio_tpu.filter.state import LEG, FilterState, ImuState

RNG = np.random.default_rng(42)


def rand_imu_state(dtype=jnp.float64):
    from orcvio_tpu.math import so3

    return ImuState(
        R=so3.exp(jnp.asarray(RNG.normal(size=3) * 0.5, dtype)),
        v=jnp.asarray(RNG.normal(size=3), dtype),
        p=jnp.asarray(RNG.normal(size=3) * 2, dtype),
        bg=jnp.asarray(RNG.normal(size=3) * 0.01, dtype),
        ba=jnp.asarray(RNG.normal(size=3) * 0.05, dtype),
    )


def propagate_with_bias(cfg, imu, m_gyro, m_acc, dt, g_w):
    gyro = m_gyro - imu.bg
    acc = m_acc - imu.ba
    if cfg.use_larvio:
        return prop.propagate_mean_rk4(imu, gyro, acc, dt, g_w)
    return prop.propagate_mean_closed_form(imu, gyro, acc, dt, g_w)


def inject_error(imu, err, left):
    from orcvio_tpu.math import so3

    dth, dv, dp, dbg, dba = err[0:3], err[3:6], err[6:9], err[9:12], err[12:15]
    R = so3.exp(dth) @ imu.R if left else imu.R @ so3.exp(dth)
    return ImuState(R=R, v=imu.v + dv, p=imu.p + dp, bg=imu.bg + dbg, ba=imu.ba + dba)


def extract_error(imu_pert, imu_nom, left):
    from orcvio_tpu.math import so3

    if left:
        dth = so3.log(imu_pert.R @ imu_nom.R.T)
    else:
        dth = so3.log(imu_nom.R.T @ imu_pert.R)
    return jnp.concatenate(
        [dth, imu_pert.v - imu_nom.v, imu_pert.p - imu_nom.p, imu_pert.bg - imu_nom.bg, imu_pert.ba - imu_nom.ba]
    )


class TestMeanPropagation:
    def test_zero_gyro_constant_acc(self):
        cfg = FilterConfig()
        g_w = jnp.asarray([0.0, 0.0, -cfg.gravity])
        imu = ImuState.identity(jnp.float64)
        acc = jnp.asarray([1.0, 0.0, cfg.gravity])  # net accel = +x
        dt = 0.5
        out = prop.propagate_mean_closed_form(imu, jnp.zeros(3), acc, dt, g_w)
        assert jnp.allclose(out.p, jnp.asarray([0.5 * dt**2, 0, 0]), atol=1e-12)
        assert jnp.allclose(out.v, jnp.asarray([dt, 0, 0]), atol=1e-12)
        assert jnp.allclose(out.R, jnp.eye(3))
        out2 = prop.propagate_mean_rk4(imu, jnp.zeros(3), acc, dt, g_w)
        assert jnp.allclose(out2.p, out.p, atol=1e-12)
        assert jnp.allclose(out2.v, out.v, atol=1e-12)

    def test_rk4_matches_closed_form_small_dt(self):
        cfg = FilterConfig()
        g_w = jnp.asarray([0.0, 0.0, -cfg.gravity])
        imu = rand_imu_state()
        gyro = jnp.asarray([0.3, -0.2, 0.5])
        acc = jnp.asarray([1.0, 2.0, 9.0])
        dt = 0.002
        a = prop.propagate_mean_closed_form(imu, gyro, acc, dt, g_w)
        b = prop.propagate_mean_rk4(imu, gyro, acc, dt, g_w)
        assert jnp.allclose(a.p, b.p, atol=1e-10)
        assert jnp.allclose(a.v, b.v, atol=1e-9)
        assert jnp.allclose(a.R, b.R, atol=1e-10)

    def test_pure_rotation(self):
        from orcvio_tpu.math import so3

        cfg = FilterConfig()
        g_w = jnp.asarray([0.0, 0.0, -cfg.gravity])
        imu = ImuState.identity(jnp.float64)
        gyro = jnp.asarray([0.0, 0.0, 1.0])
        acc = -g_w  # hover: cancels gravity at identity attitude... only at t=0
        dt = 0.01
        out = prop.propagate_mean_closed_form(imu, gyro, jnp.zeros(3), dt, jnp.zeros(3))
        assert jnp.allclose(out.R, so3.exp(gyro * dt), atol=1e-12)
        assert jnp.allclose(out.p, 0.0, atol=1e-12)


def numeric_phi(cfg, imu, m_gyro, m_acc, dt):
    """Autodiff Jacobian of the discrete error transition."""
    g_w = jnp.asarray([0.0, 0.0, -cfg.gravity])
    left = cfg.use_larvio or cfg.use_left_perturbation
    nom = propagate_with_bias(cfg, imu, m_gyro, m_acc, dt, g_w)

    def f(err):
        pert = inject_error(imu, err, left)
        out = propagate_with_bias(cfg, pert, m_gyro, m_acc, dt, g_w)
        return extract_error(out, nom, left)

    return jax.jacobian(f)(jnp.zeros(15, dtype=jnp.float64))


def analytic_phi(cfg, imu, m_gyro, m_acc, dt):
    g_w = jnp.asarray([0.0, 0.0, -cfg.gravity])
    gyro = m_gyro - imu.bg
    acc = m_acc - imu.ba
    imu_new = propagate_with_bias(cfg, imu, m_gyro, m_acc, dt, g_w)
    if cfg.use_larvio or cfg.use_closed_form_cov_prop:
        if cfg.use_larvio or cfg.use_left_perturbation:
            Phi = prop.phi_closed_form_left(
                imu.R, dt, gyro, acc, gyro, imu.v, imu.p, imu_new.v, imu_new.p, g_w
            )
        else:
            Phi = prop.phi_closed_form_right(imu.R, dt, gyro, acc)
    else:
        Phi = prop.phi_euler(imu_new.R, gyro, acc, dt, cfg.use_left_perturbation)
    return Phi[:15, :15]


PHI_CASES = [
    # (use_larvio, use_left, use_closed_form, tol_scale)
    pytest.param(False, True, False, 40.0, id="euler-left"),
    pytest.param(False, False, False, 40.0, id="euler-right"),
    pytest.param(False, True, True, 6.0, id="closed-left"),
    pytest.param(False, False, True, 6.0, id="closed-right"),
    pytest.param(True, True, True, 6.0, id="larvio-closed"),
]


class TestPhi:
    @pytest.mark.parametrize("use_larvio,use_left,use_cf,tol_scale", PHI_CASES)
    def test_phi_matches_numeric(self, use_larvio, use_left, use_cf, tol_scale):
        cfg = FilterConfig(
            use_larvio=use_larvio,
            use_left_perturbation=use_left,
            use_closed_form_cov_prop=use_cf,
        )
        imu = rand_imu_state()
        m_gyro = jnp.asarray([0.3, -0.25, 0.4]) + imu.bg
        m_acc = jnp.asarray([1.5, -0.8, 9.5]) + imu.ba
        dt = 0.005
        Phi_a = analytic_phi(cfg, imu, m_gyro, m_acc, dt)
        Phi_n = numeric_phi(cfg, imu, m_gyro, m_acc, dt)
        # First-order consistency: discrepancy must be O(dt^2) terms.
        tol = tol_scale * dt * dt
        err = float(jnp.abs(Phi_a - Phi_n).max())
        assert err < tol, f"max |Phi_a - Phi_n| = {err:.3e} (tol {tol:.1e})"

    def test_phi_convergence_order(self):
        """Closed-form Phi error should shrink ~quadratically (or better) in dt."""
        cfg = FilterConfig(use_left_perturbation=False, use_closed_form_cov_prop=True)
        imu = rand_imu_state()
        m_gyro = jnp.asarray([0.3, -0.25, 0.4])
        m_acc = jnp.asarray([1.5, -0.8, 9.5])
        errs = []
        for dt in [0.02, 0.01, 0.005]:
            e = float(
                jnp.abs(
                    analytic_phi(cfg, imu, m_gyro, m_acc, dt) - numeric_phi(cfg, imu, m_gyro, m_acc, dt)
                ).max()
            )
            errs.append(e)
        assert errs[2] < errs[0] / 4 + 1e-12, errs


class TestProcessAndBatch:
    def make_state(self, cfg):
        st = FilterState.create(cfg, dtype=jnp.float64)
        return st.replace(imu=rand_imu_state(), imu_fej_now=st.imu, t=jnp.asarray(0.0, jnp.float64))

    @pytest.mark.parametrize("use_larvio,use_left,use_cf", [(False, True, False), (False, False, True), (True, True, True)])
    def test_covariance_psd_and_growth(self, use_larvio, use_left, use_cf):
        cfg = FilterConfig(sw_size=4, max_features=8, use_larvio=use_larvio, use_left_perturbation=use_left, use_closed_form_cov_prop=use_cf)
        st = self.make_state(cfg)
        t = 0.0
        for i in range(50):
            t += 0.005
            gyro = jnp.asarray(RNG.normal(size=3) * 0.2)
            acc = jnp.asarray([0, 0, 9.81]) + jnp.asarray(RNG.normal(size=3) * 0.3)
            st = prop.process_step(cfg, st, t, gyro, acc, st.last_gyro, st.last_acc)
            st = st.replace(last_gyro=gyro, last_acc=acc)
        P = np.asarray(st.P)
        assert np.allclose(P, P.T)
        evals = np.linalg.eigvalsh(P[:15, :15])
        assert evals.min() > -1e-12
        # velocity uncertainty must grow from acc noise
        assert P[3, 3] > cfg.init_cov_velocity

    def test_imu_batch_mask_noop(self):
        cfg = FilterConfig(sw_size=4, max_features=8)
        st = self.make_state(cfg)
        S = 8
        imu_t = jnp.linspace(0.005, 0.04, S)
        gyros = jnp.asarray(RNG.normal(size=(S, 3)) * 0.1)
        accs = jnp.asarray([0, 0, 9.81]) + jnp.asarray(RNG.normal(size=(S, 3)) * 0.1)
        # all masked -> identity
        out = prop.imu_batch(cfg, st, imu_t, gyros, accs, jnp.zeros(S, bool))
        assert jnp.allclose(out.P, st.P)
        assert jnp.allclose(out.imu.p, st.imu.p)
        assert float(out.t) == float(st.t)
        # first half masked == processing only second half
        mask = jnp.arange(S) >= S // 2
        out1 = prop.imu_batch(cfg, st, imu_t, gyros, accs, mask)
        out2 = prop.imu_batch(cfg, st, imu_t[S // 2 :], gyros[S // 2 :], accs[S // 2 :], jnp.ones(S // 2, bool))
        assert jnp.allclose(out1.P, out2.P, atol=1e-12)
        assert jnp.allclose(out1.imu.p, out2.imu.p, atol=1e-12)

    def test_imu_batch_jits(self):
        cfg = FilterConfig(sw_size=4, max_features=8)
        st = self.make_state(cfg)
        S = 8
        fn = jax.jit(lambda s, t, g, a, m: prop.imu_batch(cfg, s, t, g, a, m))
        out = fn(st, jnp.linspace(0.005, 0.04, S), jnp.zeros((S, 3)), jnp.tile(jnp.asarray([0, 0, 9.81]), (S, 1)), jnp.ones(S, bool))
        assert float(out.t) == pytest.approx(0.04)


class TestBatchedVsScan:
    """The batched slab formulation (_imu_batch_transition_batched) must
    reproduce the per-sample scan (_imu_batch_transition_scan) across every
    propagation variant: same algebra, reassociated — differences are
    roundoff only (f64 here, so ~1e-12)."""

    CASES = [
        pytest.param(dict(use_larvio=False, use_left_perturbation=True,
                          use_closed_form_cov_prop=False), id="euler-left"),
        pytest.param(dict(use_larvio=False, use_left_perturbation=False,
                          use_closed_form_cov_prop=False), id="euler-right"),
        pytest.param(dict(use_larvio=False, use_left_perturbation=True,
                          use_closed_form_cov_prop=True), id="closed-left"),
        pytest.param(dict(use_larvio=False, use_left_perturbation=False,
                          use_closed_form_cov_prop=True), id="closed-right"),
        pytest.param(dict(use_larvio=True, use_left_perturbation=True,
                          use_closed_form_cov_prop=True), id="larvio"),
        pytest.param(dict(use_larvio=True, use_left_perturbation=True,
                          use_closed_form_cov_prop=True, if_fej=True), id="larvio-fej"),
        pytest.param(dict(use_larvio=False, use_left_perturbation=True,
                          use_closed_form_cov_prop=True, if_fej=True), id="closed-left-fej"),
    ]

    @pytest.mark.parametrize("kw", CASES)
    @pytest.mark.parametrize("maskmode", ["all", "head", "holes", "none"])
    def test_matches_scan(self, kw, maskmode):
        cfg = FilterConfig(sw_size=4, max_features=8, **kw)
        st = FilterState.create(cfg, dtype=jnp.float64)
        imu = rand_imu_state()
        # a distinct stored FEJ state exercises the sample-0 fej_old path
        fej = ImuState(R=imu.R, v=imu.v + 0.01, p=imu.p + 0.02, bg=imu.bg, ba=imu.ba)
        st = st.replace(imu=imu, imu_old=imu, imu_fej_now=fej, imu_fej_old=fej,
                        t=jnp.asarray(0.0, jnp.float64),
                        last_gyro=jnp.asarray(RNG.normal(size=3) * 0.1),
                        last_acc=jnp.asarray([0, 0, 9.7]))
        S = 9  # odd: exercises the leftover branch of the tree compose
        imu_t = jnp.linspace(0.005, 0.045, S)
        gyros = jnp.asarray(RNG.normal(size=(S, 3)) * 0.3)
        accs = jnp.asarray([0, 0, 9.81]) + jnp.asarray(RNG.normal(size=(S, 3)) * 0.5)
        mask = dict(
            all=jnp.ones(S, bool),
            head=jnp.arange(S) >= 3,
            holes=jnp.asarray([1, 0, 1, 1, 0, 0, 1, 1, 0], bool),
            none=jnp.zeros(S, bool),
        )[maskmode]

        out_b = prop._imu_batch_transition_batched(cfg, st, imu_t, gyros, accs, mask)
        out_s = prop._imu_batch_transition_scan(cfg, st, imu_t, gyros, accs, mask)
        st_b, Phi_b, Q_b, _, g_b, a_b = out_b
        st_s, Phi_s, Q_s, _, g_s, a_s = out_s
        assert jnp.allclose(Phi_b, Phi_s, atol=1e-11), float(jnp.abs(Phi_b - Phi_s).max())
        assert jnp.allclose(Q_b, Q_s, atol=1e-14), float(jnp.abs(Q_b - Q_s).max())
        for fld in ("R", "v", "p"):
            assert jnp.allclose(getattr(st_b.imu, fld), getattr(st_s.imu, fld), atol=1e-11), fld
            assert jnp.allclose(getattr(st_b.imu_old, fld), getattr(st_s.imu_old, fld), atol=1e-11), ("old", fld)
            assert jnp.allclose(getattr(st_b.imu_fej_old, fld), getattr(st_s.imu_fej_old, fld), atol=1e-11), ("fejold", fld)
        assert float(st_b.t) == pytest.approx(float(st_s.t), abs=0)
        assert jnp.allclose(g_b, g_s) and jnp.allclose(a_b, a_s)

    def test_single_sample_fej_old(self):
        """S == 1: fej_old must be the STORED fej, not the mean."""
        cfg = FilterConfig(sw_size=4, max_features=8, if_fej=True,
                           use_closed_form_cov_prop=True)
        st = FilterState.create(cfg, dtype=jnp.float64)
        imu = rand_imu_state()
        fej = ImuState(R=imu.R, v=imu.v + 0.5, p=imu.p + 0.7, bg=imu.bg, ba=imu.ba)
        st = st.replace(imu=imu, imu_fej_now=fej, imu_fej_old=fej,
                        t=jnp.asarray(0.0, jnp.float64))
        args = (jnp.asarray([0.005]), jnp.asarray([[0.1, 0.2, -0.1]]),
                jnp.asarray([[0.0, 0.1, 9.8]]), jnp.ones(1, bool))
        st_b, *_ = prop._imu_batch_transition_batched(cfg, st, *args)
        st_s, *_ = prop._imu_batch_transition_scan(cfg, st, *args)
        assert jnp.allclose(st_b.imu_fej_old.v, fej.v)
        assert jnp.allclose(st_b.imu_fej_old.v, st_s.imu_fej_old.v)
