"""IMU mean + covariance propagation.

TPU-native equivalent of the reference propagation stack
(``src/orcvio.cpp:664`` batchImuProcessing, ``:727`` processModel,
``:899`` predictNewStateOrcVIO, ``:825`` predictNewStateLARVIO,
``:3980`` calPhiClosedForm, ``:3952`` calPhiEulerMethod): the per-sample C++
loop becomes a ``lax.scan`` over a fixed-capacity per-frame IMU slab with a
validity mask (masked samples have dt = 0 and are exact no-ops), and the dense
d x d covariance update touches only the 22-dim leg block + cross terms.

IMU intrinsics (Tg/As/Ma): with cfg.calib_imu the measurements are corrected
as acc = Ma (a_m - ba), gyro = Tg (w_m - As acc - bg) (processModel,
orcvio.cpp:732-746) and the 24 intrinsic error states get transition columns.
Unlike the reference's hand-written RK4 sensitivity blocks (calPhiClosedForm's
calib_imu branch, orcvio.cpp:4040-4300), the [theta v p] x [bg ba intrinsics]
columns are obtained by forward-mode autodiff of the exact mean propagation at
zero perturbation — per-sample, accumulated through the slab scan. With
calib_imu off the propagation path is bit-identical to before (intrinsics
never touch it).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config.core import FilterConfig
from ..math import so3
from .state import (
    BA,
    BG,
    LEG,
    POS,
    THETA,
    VEL,
    FilterState,
    ImuState,
    apply_imu_intrinsics_delta,
)


def gravity_vec(cfg: FilterConfig, dtype=jnp.float32):
    return jnp.asarray([0.0, 0.0, -cfg.gravity], dtype)


# ---------------------------------------------------------------------------
# Mean propagation
# ---------------------------------------------------------------------------

def propagate_mean_closed_form(imu: ImuState, gyro, acc, dt, g_w) -> ImuState:
    """SE(3) closed-form propagation. Ref: predictNewStateOrcVIO (orcvio.cpp:899).

    p' = p + v dt + g dt^2/2 + R Hl(dt w) a dt^2
    v' = v + g dt + R Jl(dt w) a dt
    R' = R exp(dt w)
    """
    w_dt = dt * gyro
    p = imu.p + dt * imu.v + g_w * (dt * dt * 0.5) + imu.R @ (so3.Hl(w_dt) @ acc) * (dt * dt)
    v = imu.v + g_w * dt + imu.R @ (so3.left_jacobian(w_dt) @ acc) * dt
    R = imu.R @ so3.exp(w_dt)
    return imu.replace(R=R, v=v, p=p)


def propagate_mean_rk4(imu: ImuState, gyro, acc, dt, g_w) -> ImuState:
    """RK4 propagation. Ref: predictNewStateLARVIO (orcvio.cpp:825).

    Quaternion integration with the exact half/full-step attitude and RK4 on
    (v, p); implemented directly on rotation matrices (R exp of half/full
    rotation increments is the same closed form the reference's Omega-matrix
    quaternion update realizes).
    """
    R_dt = imu.R @ so3.exp(dt * gyro)
    R_dt2 = imu.R @ so3.exp(0.5 * dt * gyro)

    k1_v_dot = imu.R @ acc + g_w
    k1_p_dot = imu.v

    k1_v = imu.v + k1_v_dot * dt / 2
    k2_v_dot = R_dt2 @ acc + g_w
    k2_p_dot = k1_v

    k2_v = imu.v + k2_v_dot * dt / 2
    k3_v_dot = R_dt2 @ acc + g_w
    k3_p_dot = k2_v

    k3_v = imu.v + k3_v_dot * dt
    k4_v_dot = R_dt @ acc + g_w
    k4_p_dot = k3_v

    v = imu.v + dt / 6 * (k1_v_dot + 2 * k2_v_dot + 2 * k3_v_dot + k4_v_dot)
    p = imu.p + dt / 6 * (k1_p_dot + 2 * k2_p_dot + 2 * k3_p_dot + k4_p_dot)
    return imu.replace(R=R_dt, v=v, p=p)


# ---------------------------------------------------------------------------
# Error-state transition (Phi, 22 x 22)
# ---------------------------------------------------------------------------

def _phi_base(dtype):
    return jnp.eye(LEG, dtype=dtype)


def phi_euler(R_new, gyro, acc, dt, use_left_perturbation: bool):
    """First-order Phi. Ref: calPhiEulerMethod (orcvio.cpp:3952).

    Uses the *post-propagation* orientation, as the reference does (it is
    called after predictNewState*).
    """
    dtype = R_new.dtype
    Phi = _phi_base(dtype)
    I3 = jnp.eye(3, dtype=dtype)
    if use_left_perturbation:
        Phi = Phi.at[THETA, BG].set(-dt * R_new)
        Phi = Phi.at[VEL, THETA].set(-dt * so3.hat(R_new @ acc))
        Phi = Phi.at[VEL, BA].set(-dt * R_new)
        Phi = Phi.at[POS, VEL].set(dt * I3)
    else:
        Phi = Phi.at[THETA, THETA].set(I3 - dt * so3.hat(gyro))
        Phi = Phi.at[THETA, BG].set(-dt * I3)
        Phi = Phi.at[VEL, THETA].set(-dt * R_new @ so3.hat(acc))
        Phi = Phi.at[VEL, BA].set(-dt * R_new)
        Phi = Phi.at[POS, VEL].set(dt * I3)
    return Phi


def phi_closed_form_left(
    C_old, dt, gyro, acc, gyro_old, v_k, p_k, v_kp1, p_kp1, g_w
):
    """Closed-form Phi, left perturbation / LARVIO flavor.

    Ref: calPhiClosedForm (orcvio.cpp:3980), with trivial IMU intrinsics
    (Tg = Ma = I, As = 0, so all T*/A*/M* blocks vanish and TA = 0).
    v_k/p_k/v_kp1/p_kp1 may be FEJ values when if_FEJ is on.
    """
    dtype = C_old.dtype
    I3 = jnp.eye(3, dtype=dtype)
    axis_angle = dt * (gyro_old + gyro) / 2 + dt * dt * jnp.cross(gyro_old, gyro) / 12
    A = so3.hat(axis_angle)

    Phi = _phi_base(dtype)
    Phi = Phi.at[THETA, BG].set(-0.5 * C_old @ (2 * I3 + A) * dt)
    # Phi[THETA, BA] = 0 (TA = 0)
    Phi = Phi.at[VEL, THETA].set(-so3.hat(v_kp1 - v_k - g_w * dt))
    phi_v_bg = (
        so3.hat(-p_kp1 + p_k + v_kp1 * dt - 0.5 * g_w * dt * dt) @ C_old
        + so3.hat(-0.5 * p_kp1 + 0.5 * p_k + 0.5 * v_kp1 * dt - g_w * dt * dt / 6) @ C_old @ A
    )
    Phi = Phi.at[VEL, BG].set(phi_v_bg)
    Phi = Phi.at[VEL, BA].set(-0.5 * C_old @ (2 * I3 + A) * dt)
    Phi = Phi.at[POS, THETA].set(-so3.hat(p_kp1 - p_k - v_k * dt - 0.5 * g_w * dt * dt))
    Phi = Phi.at[POS, VEL].set(dt * I3)
    phi_p_bg = (
        -(dt**3) * so3.hat(g_w) @ C_old / 6
        + dt * so3.hat(p_kp1 - p_k - g_w * dt * dt / 6) @ C_old @ A / 4
    )
    Phi = Phi.at[POS, BG].set(phi_p_bg)
    Phi = Phi.at[POS, BA].set(-C_old @ (3 * I3 + A) * (dt * dt) / 6)
    return Phi


def phi_closed_form_right(C_old, dt, gyro, acc):
    """Closed-form Phi, right perturbation. Ref: orcvio.cpp:4308-4370.

    Exact transition (to second order in dt on the bias columns) for constant
    (gyro, acc) over dt under the SE(3) closed-form mean propagation, with the
    error convention R' = R exp(dtheta), v' = v + dv, p' = p + dp (verified
    against autodiff in tests/test_propagation.py).

    NOTE — deliberate deviation: the reference's Phi_v_bg / Phi_p_bg blocks
    ("v_gyro"/"p_gyro", orcvio.cpp:4343,4349) are O(dt) while the true
    derivative of its own mean propagation wrt gyro bias is O(dt^2); its
    expressions disagree with numerical differentiation of the propagation it
    covers (0.13 vs 1e-4 at dt = 5 ms, EuRoC-scale inputs). We use the correct
    series  dv/dbg = R (dt^2/2 a^ + dt^3/3 (w x a)^ + dt^3/6 a^ w^),
    dp/dbg = R dt^3/6 a^,  which autodiff confirms to ~1e-9.
    """
    dtype = C_old.dtype
    I3 = jnp.eye(3, dtype=dtype)
    wRi = C_old
    a_skew = so3.hat(acc)
    w_skew = so3.hat(gyro)

    theta_theta = so3.exp(-dt * gyro)
    JL_plus = so3.left_jacobian(dt * gyro)
    JL_minus = so3.left_jacobian(-dt * gyro)
    HL_plus = so3.Hl(dt * gyro)

    theta_gyro = -dt * JL_minus
    v_theta = -dt * wRi @ so3.hat(JL_plus @ acc)
    v_gyro = wRi @ (
        (dt * dt / 2) * a_skew
        + (dt**3 / 3) * so3.hat(jnp.cross(gyro, acc))
        + (dt**3 / 6) * a_skew @ w_skew
    )
    v_acc = -dt * wRi @ JL_plus
    p_theta = -(dt * dt) * wRi @ so3.hat(HL_plus @ acc)
    p_v = dt * I3
    p_gyro = (dt**3 / 6) * wRi @ a_skew
    p_acc = -(dt * dt) * wRi @ HL_plus

    Phi = _phi_base(dtype)
    Phi = Phi.at[THETA, THETA].set(theta_theta)
    Phi = Phi.at[THETA, BG].set(theta_gyro)
    Phi = Phi.at[VEL, THETA].set(v_theta)
    Phi = Phi.at[VEL, BG].set(v_gyro)
    Phi = Phi.at[VEL, BA].set(v_acc)
    Phi = Phi.at[POS, THETA].set(p_theta)
    Phi = Phi.at[POS, VEL].set(p_v)
    Phi = Phi.at[POS, BG].set(p_gyro)
    Phi = Phi.at[POS, BA].set(p_acc)
    return Phi


def noise_input_matrix(C_old, use_left_or_larvio: bool, dtype):
    """G (22 x 12). Ref: orcvio.cpp:773-795."""
    G = jnp.zeros((LEG, 12), dtype=dtype)
    I3 = jnp.eye(3, dtype=dtype)
    if use_left_or_larvio:
        G = G.at[THETA, 0:3].set(-C_old)
    else:
        G = G.at[THETA, 0:3].set(-I3)
    G = G.at[VEL, 3:6].set(-C_old)
    G = G.at[BG, 6:9].set(I3)
    G = G.at[BA, 9:12].set(I3)
    return G


def _bias_intrinsic_sensitivity(cfg, imu_old, dt, gyro_m, acc_m, Tg, As, Ma, bg, ba, g_w, imu_nom):
    """(9, 30) sensitivity of the propagated [theta v p] error to
    [dbg(3) dba(3) dintr(24)], by jacfwd of the exact mean propagation at zero
    perturbation. theta uses the configured perturbation convention."""
    left = cfg.use_larvio or cfg.use_left_perturbation

    def h_err(dvec):
        dbg, dba, d24 = dvec[:3], dvec[3:6], dvec[6:]
        Tg2, As2, Ma2 = apply_imu_intrinsics_delta(Tg, As, Ma, d24)
        acc = Ma2 @ (acc_m - (ba + dba))
        gyro = Tg2 @ (gyro_m - As2 @ acc - (bg + dbg))
        if cfg.use_larvio:
            im = propagate_mean_rk4(imu_old, gyro, acc, dt, g_w)
        else:
            im = propagate_mean_closed_form(imu_old, gyro, acc, dt, g_w)
        M = im.R @ imu_nom.R.T if left else imu_nom.R.T @ im.R
        dth = jnp.stack([M[2, 1] - M[1, 2], M[0, 2] - M[2, 0], M[1, 0] - M[0, 1]]) * 0.5
        return jnp.concatenate([dth, im.v - imu_nom.v, im.p - imu_nom.p])

    return jax.jacfwd(h_err)(jnp.zeros(30, imu_old.R.dtype))


# ---------------------------------------------------------------------------
# One IMU sample (processModel) and the per-frame scan (batchImuProcessing)
# ---------------------------------------------------------------------------

def _leg_phi_q(cfg: FilterConfig, state: FilterState, t_imu, gyro_m, acc_m, gyro_m_old, acc_m_old):
    """One IMU sample's mean propagation + (Phi, Q) on the 22-dim leg.

    Factored out of process_step so the per-frame scan can accumulate
    Phi_total / Q_total at 22x22 cost and touch the full covariance once per
    frame (mathematically identical: P <- Phi P Phi^T + Q composes).
    """
    dt = t_imu - state.t
    g_w = gravity_vec(cfg, state.P.dtype)

    if cfg.calib_imu:
        # acc = Ma (a_m - ba); gyro = Tg (w_m - As acc - bg) (orcvio.cpp:732)
        acc = state.Ma @ (acc_m - state.imu.ba)
        gyro = state.Tg @ (gyro_m - state.As @ acc - state.imu.bg)
        acc_old = state.Ma @ (acc_m_old - state.imu.ba)
        gyro_old = state.Tg @ (gyro_m_old - state.As @ acc_old - state.imu.bg)
    else:
        acc = acc_m - state.imu.ba
        gyro = gyro_m - state.imu.bg
        acc_old = acc_m_old - state.imu.ba
        gyro_old = gyro_m_old - state.imu.bg

    imu_old = state.imu
    if cfg.use_larvio:
        imu_new = propagate_mean_rk4(state.imu, gyro, acc, dt, g_w)
    else:
        imu_new = propagate_mean_closed_form(state.imu, gyro, acc, dt, g_w)

    fej_old = state.imu_fej_now
    fej_now = imu_new  # FEJ "now" tracks the propagated state (orcvio.cpp:893-896)

    if cfg.use_larvio or cfg.use_closed_form_cov_prop:
        if cfg.use_larvio or cfg.use_left_perturbation:
            v_k, p_k = (fej_old.v, fej_old.p) if cfg.if_fej else (imu_old.v, imu_old.p)
            v_kp1, p_kp1 = (fej_now.v, fej_now.p) if cfg.if_fej else (imu_new.v, imu_new.p)
            Phi = phi_closed_form_left(imu_old.R, dt, gyro, acc, gyro_old, v_k, p_k, v_kp1, p_kp1, g_w)
        else:
            Phi = phi_closed_form_right(imu_old.R, dt, gyro, acc)
    else:
        Phi = phi_euler(imu_new.R, gyro, acc, dt, cfg.use_left_perturbation)

    if cfg.calib_imu:
        # autodiff-exact [theta v p] x [bg ba intr] columns (the analytic
        # bias columns above assume identity intrinsics)
        B = _bias_intrinsic_sensitivity(
            cfg, imu_old, dt, gyro_m, acc_m, state.Tg, state.As, state.Ma,
            state.imu.bg, state.imu.ba, g_w, imu_new,
        )
        Phi = Phi.at[0:9, 9:15].set(B[:, :6])
        S = jnp.zeros((LEG, 24), state.P.dtype).at[0:9].set(B[:, 6:])
    else:
        S = None

    G = noise_input_matrix(imu_old.R, cfg.use_larvio or cfg.use_left_perturbation, state.P.dtype)
    Qc = jnp.asarray(cfg.continuous_noise_cov(), state.P.dtype)
    PhiG = Phi @ G
    Q = PhiG @ Qc @ PhiG.T * dt

    state = state.replace(
        t=jnp.asarray(t_imu, state.t.dtype),
        imu=imu_new,
        imu_old=imu_old,
        imu_fej_now=fej_now,
        imu_fej_old=fej_old,
    )
    return state, Phi, Q, S


def apply_leg_covariance(state: FilterState, Phi, Q, S=None, ib: int = 0) -> FilterState:
    """P <- T P T^T + Q with T = [[Phi, S@intr], [0, I]] (orcvio.cpp:797-816).

    With S=None this is the plain leg congruence. With S (LEG, 24) the
    intrinsic block at [ib:ib+24] feeds the leg rows; the intrinsic states
    themselves are constants (no dynamics, no process noise).
    """
    P = state.P
    if S is None:
        P_ll = Phi @ P[:LEG, :LEG] @ Phi.T + Q
        P_lr = Phi @ P[:LEG, LEG:]
        P = P.at[:LEG, :LEG].set(P_ll)
        P = P.at[:LEG, LEG:].set(P_lr)
        P = P.at[LEG:, :LEG].set(P_lr.T)
    else:
        Pl = Phi @ P[:LEG, :] + S @ P[ib : ib + 24, :]
        P = P.at[:LEG, :].set(Pl)
        Pc = P[:, :LEG] @ Phi.T + P[:, ib : ib + 24] @ S.T
        P = P.at[:, :LEG].set(Pc)
        P = P.at[:LEG, :LEG].add(Q)
    P = 0.5 * (P + P.T)
    return state.replace(P=P)


def process_step(cfg: FilterConfig, state: FilterState, t_imu, gyro_m, acc_m, gyro_m_old, acc_m_old):
    """One IMU sample: mean + covariance. Ref: processModel (orcvio.cpp:727).

    All quantities at dt = 0 reduce to exact no-ops, so masked (padding)
    samples can call this with t_imu == state.t.
    """
    state, Phi, Q, S = _leg_phi_q(cfg, state, t_imu, gyro_m, acc_m, gyro_m_old, acc_m_old)
    return apply_leg_covariance(state, Phi, Q, S, cfg.intrinsic_base)


def imu_batch(cfg: FilterConfig, state: FilterState, imu_t, imu_gyro, imu_acc, imu_mask):
    """Propagate through a per-frame IMU slab. Ref: batchImuProcessing (orcvio.cpp:664).

    imu_t: (S,), imu_gyro/imu_acc: (S, 3), imu_mask: (S,) bool. Masked samples
    are no-ops (their timestamps are replaced by the running state time so
    dt = 0). The (gyro_old, acc_old) pair threads through the scan, matching
    the reference's m_gyro_old/m_acc_old carried across frames.
    """

    state2, Phi_tot, Q_tot, S_tot, g_last, a_last = imu_batch_transition(
        cfg, state, imu_t, imu_gyro, imu_acc, imu_mask
    )
    state2 = apply_leg_covariance(state2, Phi_tot, Q_tot, S_tot, cfg.intrinsic_base)
    return state2.replace(last_gyro=g_last, last_acc=a_last)


def imu_batch_transition(cfg: FilterConfig, state: FilterState, imu_t, imu_gyro, imu_acc, imu_mask):
    """Slab mean propagation + accumulated (Phi_tot, Q_tot, S_tot).

    Exposed separately so tests can check the accumulated transition against
    autodiff of the whole-slab propagation. S_tot is None unless
    cfg.calib_imu: S composes as S <- Phi_k S + S_k (intrinsics constant).

    Dispatch: without IMU intrinsics the slab runs through the batched
    formulation (_imu_batch_transition_batched) — O(log S) sequential depth
    instead of S unrolled per-sample bodies; with calib_imu the autodiff
    sensitivity columns keep the per-sample scan."""
    if not cfg.calib_imu:
        return _imu_batch_transition_batched(cfg, state, imu_t, imu_gyro, imu_acc, imu_mask)
    return _imu_batch_transition_scan(cfg, state, imu_t, imu_gyro, imu_acc, imu_mask)


def _compose_transitions(Phi, Q):
    """Fold per-sample (Phi_k, Q_k) into (Phi_tot, Q_tot) by pairwise tree
    reduction: total = Phi_{S-1} ... Phi_0, Q composing as
    Q <- Phi_b Q_a Phi_b^T + Q_b (a before b). log2(S) batched 22x22 matmul
    levels instead of S sequential composes — the associativity the reference's
    per-sample loop never exploits."""
    n = Phi.shape[0]
    while n > 1:
        m = n // 2
        Pa, Qa = Phi[0 : 2 * m : 2], Q[0 : 2 * m : 2]
        Pb, Qb = Phi[1 : 2 * m : 2], Q[1 : 2 * m : 2]
        Pc = Pb @ Pa
        Qc = Pb @ Qa @ jnp.swapaxes(Pb, -1, -2) + Qb
        if n % 2:
            Pc = jnp.concatenate([Pc, Phi[-1:]], axis=0)
            Qc = jnp.concatenate([Qc, Q[-1:]], axis=0)
        Phi, Q = Pc, Qc
        n = (n + 1) // 2
    return Phi[0], Q[0]


def _imu_batch_transition_batched(cfg: FilterConfig, state: FilterState,
                                  imu_t, imu_gyro, imu_acc, imu_mask):
    """Whole-slab propagation with batched per-sample math.

    The only truly sequential dependencies in the slab are tiny: the
    orientation chain R_k = R_0 exp(w_0 dt_0) ... exp(w_{k-1} dt_{k-1})
    (a cumulative 3x3 product) and the v/p prefix sums. Everything else —
    the Rodrigues exponentials, the per-sample Phi_k blocks, the noise
    congruences — is data-parallel across the S samples and runs as ONE
    batched op set, then folds with _compose_transitions. Identical algebra
    to the per-sample scan (same Phi/Q formulas, reassociated products);
    pinned against it in tests/test_propagation.py.
    """
    dtype = state.P.dtype
    S = imu_t.shape[0]
    g_w = gravity_vec(cfg, dtype)

    # --- forward-fill masked samples (masked rows become exact dt=0 no-ops,
    # and the next valid sample sees the last valid (gyro, acc) as its
    # "old" pair — the same semantics the scan's carried g_old/a_old give)
    idx = jnp.arange(S)
    fill = jax.lax.cummax(jnp.where(imu_mask, idx, -1))
    has = fill >= 0
    fc = jnp.clip(fill, 0, S - 1)
    t_eff = jnp.where(has, imu_t[fc], state.t)
    g_eff = jnp.where(has[:, None], imu_gyro[fc], state.last_gyro)
    a_eff = jnp.where(has[:, None], imu_acc[fc], state.last_acc)
    t_prev = jnp.concatenate([state.t[None], t_eff[:-1]])
    g_prev = jnp.concatenate([state.last_gyro[None], g_eff[:-1]])
    a_prev = jnp.concatenate([state.last_acc[None], a_eff[:-1]])
    dt = (t_eff - t_prev).astype(dtype)

    gyro = g_eff - state.imu.bg
    acc = a_eff - state.imu.ba
    gyro_old = g_prev - state.imu.bg
    acc_old = a_prev - state.imu.ba

    # --- mean: cumulative rotation product, then v/p prefix sums
    w_dt = dt[:, None] * gyro
    exps = so3.exp(w_dt)  # (S, 3, 3)
    cum = jax.lax.associative_scan(jnp.matmul, exps)  # exps[0] @ ... @ exps[k]
    R_pre = jnp.concatenate([state.imu.R[None], state.imu.R @ cum[:-1]], axis=0)
    R_post = state.imu.R @ cum

    if cfg.use_larvio:
        exps_h = so3.exp(0.5 * w_dt)
        R_mid = jnp.einsum("sij,sjk->sik", R_pre, exps_h)
        k1vd = jnp.einsum("sij,sj->si", R_pre, acc) + g_w
        k2vd = jnp.einsum("sij,sj->si", R_mid, acc) + g_w  # = k3vd
        k4vd = jnp.einsum("sij,sj->si", R_post, acc) + g_w
        dv = dt[:, None] / 6.0 * (k1vd + 4.0 * k2vd + k4vd)
        dp_extra = dt[:, None] ** 2 / 6.0 * (k1vd + 2.0 * k2vd)
    else:
        Jl_a = jnp.einsum("sij,sj->si", so3.left_jacobian(w_dt), acc)
        Hl_a = jnp.einsum("sij,sj->si", so3.Hl(w_dt), acc)
        dv = g_w * dt[:, None] + jnp.einsum("sij,sj->si", R_pre, Jl_a) * dt[:, None]
        dp_extra = (g_w * (dt[:, None] ** 2) * 0.5
                    + jnp.einsum("sij,sj->si", R_pre, Hl_a) * dt[:, None] ** 2)

    v_cum = jnp.cumsum(dv, axis=0)
    v_pre = state.imu.v + jnp.concatenate([jnp.zeros((1, 3), dtype), v_cum[:-1]], axis=0)
    v_post = state.imu.v + v_cum
    dp = dt[:, None] * v_pre + dp_extra
    p_cum = jnp.cumsum(dp, axis=0)
    p_pre = state.imu.p + jnp.concatenate([jnp.zeros((1, 3), dtype), p_cum[:-1]], axis=0)
    p_post = state.imu.p + p_cum

    # --- per-sample Phi_k, batched (identical formulas via vmap)
    if cfg.use_larvio or cfg.use_closed_form_cov_prop:
        if cfg.use_larvio or cfg.use_left_perturbation:
            if cfg.if_fej:
                # fej_old at sample 0 is the STORED fej; it tracks the
                # propagated mean afterwards (fej_now = imu_new each sample)
                v_k = v_pre.at[0].set(state.imu_fej_now.v)
                p_k = p_pre.at[0].set(state.imu_fej_now.p)
            else:
                v_k, p_k = v_pre, p_pre
            Phi = jax.vmap(phi_closed_form_left,
                           in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None))(
                R_pre, dt, gyro, acc, gyro_old, v_k, p_k, v_post, p_post, g_w)
        else:
            Phi = jax.vmap(phi_closed_form_right)(R_pre, dt, gyro, acc)
    else:
        Phi = jax.vmap(phi_euler, in_axes=(0, 0, 0, 0, None))(
            R_post, gyro, acc, dt, cfg.use_left_perturbation)

    # --- per-sample Q_k, batched
    G = jax.vmap(noise_input_matrix, in_axes=(0, None, None))(
        R_pre, cfg.use_larvio or cfg.use_left_perturbation, dtype)
    Qc = jnp.asarray(cfg.continuous_noise_cov(), dtype)
    PhiG = Phi @ G
    Q = PhiG @ Qc @ jnp.swapaxes(PhiG, -1, -2) * dt[:, None, None]

    Phi_tot, Q_tot = _compose_transitions(Phi, Q)

    imu_new = state.imu.replace(R=R_post[-1], v=v_post[-1], p=p_post[-1])
    imu_old = state.imu.replace(R=R_pre[-1], v=v_pre[-1], p=p_pre[-1])
    fej_old = state.imu_fej_now if S == 1 else imu_old
    state2 = state.replace(
        t=t_eff[-1].astype(state.t.dtype),
        imu=imu_new,
        imu_old=imu_old,
        imu_fej_now=imu_new,
        imu_fej_old=fej_old,
    )
    return state2, Phi_tot, Q_tot, None, g_eff[-1], a_eff[-1]


def _imu_batch_transition_scan(cfg: FilterConfig, state: FilterState, imu_t, imu_gyro, imu_acc, imu_mask):
    """Per-sample scan formulation (kept for calib_imu, whose sensitivity
    columns S_k compose through the running state, and as the reference
    semantics the batched path is tested against)."""
    dtype = state.P.dtype
    eye = jnp.eye(LEG, dtype=dtype)
    calib = cfg.calib_imu

    def step(carry, inp):
        st, g_old, a_old, Phi_acc, Q_acc, S_acc = carry
        t_i, g_i, a_i, m_i = inp
        t_eff = jnp.where(m_i, t_i, st.t)
        g_eff = jnp.where(m_i, g_i, g_old)
        a_eff = jnp.where(m_i, a_i, a_old)
        st2, Phi, Q, S = _leg_phi_q(cfg, st, t_eff, g_eff, a_eff, g_old, a_old)
        # compose 22x22 accumulators; the full covariance is touched once per
        # frame (P <- Phi_tot P Phi_tot^T + Q_tot, identical by induction)
        Phi_acc2 = Phi @ Phi_acc
        Q_acc2 = Phi @ Q_acc @ Phi.T + Q
        S_acc2 = Phi @ S_acc + S if calib else S_acc
        return (st2, g_eff, a_eff, Phi_acc2, Q_acc2, S_acc2), None

    S0 = jnp.zeros((LEG, 24), dtype) if calib else jnp.zeros((), dtype)
    (state2, g_last, a_last, Phi_tot, Q_tot, S_tot), _ = jax.lax.scan(
        step,
        (state, state.last_gyro, state.last_acc, eye, jnp.zeros((LEG, LEG), dtype), S0),
        (imu_t, imu_gyro, imu_acc, imu_mask),
        # all-small-matrix body: while-loop iteration overhead dominates, so
        # unroll the whole slab (measured in scripts/bisect_filter4.py)
        unroll=True,
    )
    return state2, Phi_tot, Q_tot, (S_tot if calib else None), g_last, a_last
