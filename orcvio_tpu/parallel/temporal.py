"""Sequence/temporal parallelism: one trajectory partitioned into time blocks.

The scale-out mode the reference cannot express (SURVEY.md §5 "long-context"):
its filter is a serial per-frame loop (app/orcvioMain.cpp:106-198), so
wall-clock grows linearly with trajectory length. Here a T-frame trajectory is
split into K contiguous blocks replayed **concurrently** (one per mesh device
along an ``sp`` axis), then stitched with an associative gauge composition —
the filtering analogue of blockwise attention:

 * Within a block the filter is the unmodified serial ``filter_step`` scan.
 * Across blocks, VIO's observability structure does the heavy lifting: the
   global gauge (yaw about gravity + world translation) is exactly
   unobservable, so a block's output transforms *equivariantly* under a gauge
   move of its start state. Block results are therefore composed exactly in
   the 4-dim gauge group (associative, O(K)), while the locally-observable
   part of the boundary state (roll/pitch, velocity, biases, window geometry)
   is handed across blocks and converges in a couple of outer iterations
   (each block re-estimates it from its own data — the filter *contracts*
   observable directions).
 * The covariance (and every other slow state) is handed across one boundary
   per iteration — the stitch passes the FULL end-state pytree of block b-1
   as block b's next start — so the scheme is **exact** (bitwise up to fp
   associativity) at ``n_iters = n_blocks``, and statistically converged much
   earlier: the mean reaches accuracy parity with the serial filter in ~3
   iterations (verified against ground truth), giving wall-clock speedup
   ``n_blocks / n_iters``.

Scope: MSCKF configurations (``ekf_feature_cap == 0``). The EKF-SLAM variant
keeps feature blocks in P whose row identity differs across restarts.

Covariance calibration at n_iters < n_blocks (round-4): the end state's P
misses the earlier blocks' unobservable-gauge random walk; the measured
per-block inflation below restores it. End-position NEES, 6-seed
Monte-Carlo (120 frames, K=4 blocks, tight prior; ideal = filter-matched
= the serial row):

    serial               0.36
    n_iters=2 raw        0.86   corrected  0.24
    n_iters=3 raw        0.59   corrected  0.48

(uncorrected is ~2.4x overconfident at n_iters=2; corrected lands at the
serial filter's calibration level. tests/test_temporal.py pins the
gauge-subspace bands.)

Iteration-0 boundary guesses come from per-block IMU preintegration composed
associatively (gravity applied once at composition time), so no serial sweep
of the trajectory ever runs.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config.core import FilterConfig
from ..filter.pipeline import FrameInput, filter_step
from ..filter.state import LEG, FilterState


# --------------------------------------------------------------------------
# gauge group: g = (psi, dp) — yaw about world z composed with translation
# --------------------------------------------------------------------------

class Gauge(NamedTuple):
    psi: jnp.ndarray  # scalar yaw
    dp: jnp.ndarray  # (3,) world translation


def gauge_identity(dtype=jnp.float32) -> Gauge:
    return Gauge(jnp.zeros((), dtype), jnp.zeros((3,), dtype))


def _rz(psi):
    c, s = jnp.cos(psi), jnp.sin(psi)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, -s, z]), jnp.stack([s, c, z]), jnp.stack([z, z, o])]
    )


def gauge_compose(g1: Gauge, g2: Gauge) -> Gauge:
    """(g1 ∘ g2)·x = g1·(g2·x)."""
    return Gauge(g1.psi + g2.psi, g1.dp + _rz(g1.psi) @ g2.dp)


def _is_left(cfg: FilterConfig) -> bool:
    # matches increment_state (augment.py): larvio forces left perturbation
    return bool(cfg.use_larvio or cfg.use_left_perturbation)


def gauge_diff(x_new: FilterState, x_old: FilterState) -> Gauge:
    """The gauge move with x_new ≈ g · x_old (exact in the yaw/position dims).

    Yaw is the vertical component of the relative rotation; residual
    roll/pitch difference is *not* a gauge freedom and is left to the outer
    iteration to absorb.
    """
    from ..math import so3

    dR = x_new.imu.R @ x_old.imu.R.T
    psi = so3.log(dR)[2]
    dp = x_new.imu.p - _rz(psi) @ x_old.imu.p
    return Gauge(psi, dp)


def gauge_T(cfg: FilterConfig, psi, D: int, dtype):
    """Error-state change of coordinates under a gauge rotation: T (D, D).

    Left perturbation: world-frame error 3-vectors (theta, v, p, clone theta/p)
    rotate by Rz(psi); body-frame quantities (biases, extrinsics, td, IMU
    intrinsics) are invariant. Right perturbation: theta errors are body-frame
    and invariant; v/p errors still world-frame.
    """
    R = _rz(psi).astype(dtype)
    T = jnp.eye(D, dtype=dtype)
    rot_theta = _is_left(cfg)

    def put(T, i):
        return jax.lax.dynamic_update_slice(T, R, (i, i))

    if rot_theta:
        T = put(T, 0)
    T = put(T, 3)  # v
    T = put(T, 6)  # p
    sw = cfg.sw_size
    for k in range(sw):
        if rot_theta:
            T = put(T, LEG + 6 * k)
        T = put(T, LEG + 6 * k + 3)
    return T


def gauge_apply(cfg: FilterConfig, state: FilterState, g: Gauge) -> FilterState:
    """Transform the full filter state by a global gauge move (exact).

    Means: R ← Rz R, p ← Rz p + dp, v ← Rz v (IMU, FEJ copies, clones).
    Covariance: P ← T P Tᵀ. Camera-relative quantities (feature idp/uv,
    biases, extrinsics, td) are invariant.
    """
    R = _rz(g.psi).astype(state.P.dtype)

    def rot_imu(s):
        return s.replace(R=R @ s.R, v=R @ s.v, p=R @ s.p + g.dp)

    cl = state.clones
    v3 = cl.valid[:, None]
    v33 = cl.valid[:, None, None]
    clones = cl.replace(
        R=jnp.where(v33, jnp.einsum("ij,sjk->sik", R, cl.R), cl.R),
        p=jnp.where(v3, jnp.einsum("ij,sj->si", R, cl.p) + g.dp, cl.p),
        p_fej=jnp.where(v3, jnp.einsum("ij,sj->si", R, cl.p_fej) + g.dp, cl.p_fej),
    )
    D = state.P.shape[0]
    T = gauge_T(cfg, g.psi, D, state.P.dtype)
    P = T @ state.P @ T.T
    nui = state.nui
    if nui.valid.shape[0] and cfg.nuisance_cap:
        nv3 = nui.valid[:, None]
        nui = nui.replace(
            R=jnp.where(nui.valid[:, None, None],
                        jnp.einsum("ij,sjk->sik", R, nui.R), nui.R),
            p=jnp.where(nv3, jnp.einsum("ij,sj->si", R, nui.p) + g.dp, nui.p),
        )
    return state.replace(
        imu=rot_imu(state.imu),
        imu_old=rot_imu(state.imu_old),
        imu_fej_now=rot_imu(state.imu_fej_now),
        imu_fej_old=rot_imu(state.imu_fej_old),
        clones=clones,
        nui=nui,
        P=0.5 * (P + P.T),
    )


# --------------------------------------------------------------------------
# gauge-subspace covariance: basis, extraction, inflation
# --------------------------------------------------------------------------

def gauge_basis(cfg: FilterConfig, state: FilterState, anchor=None):
    """B (D, 4): error-state directions of the gauge group at ``state``.

    Column 0 = yaw generator (d state / d psi), columns 1:4 = world
    translation. ``anchor``: point the yaw rotates about (None = world
    origin). Anchoring at the current IMU position makes the yaw coordinate
    independent of absolute position, so per-block gauge increments become
    additive under the explicit lever-arm transport (_transport_gauge_cov) —
    about the origin, the same yaw error loads differently onto the
    yaw/translation split as the trajectory moves, and increments do not add.

    Left perturbation: theta errors are world-frame, so the yaw column has
    e_z in every theta block; right perturbation: theta errors are
    body-frame, so it has R^T e_z. v entries are z x v in both conventions.
    """
    D = state.P.shape[0]
    dtype = state.P.dtype
    z = jnp.asarray([0.0, 0.0, 1.0], dtype)
    a = jnp.zeros((3,), dtype) if anchor is None else anchor
    left = _is_left(cfg)
    B = jnp.zeros((D, 4), dtype)

    def cross_z(v):
        return jnp.cross(z, v)

    th = z if left else state.imu.R.T @ z
    B = B.at[0:3, 0].set(th)
    B = B.at[3:6, 0].set(cross_z(state.imu.v))
    B = B.at[6:9, 0].set(cross_z(state.imu.p - a))
    B = B.at[6:9, 1:4].set(jnp.eye(3, dtype=dtype))
    sw = cfg.sw_size
    for k in range(sw):
        i = LEG + 6 * k
        thk = z if left else state.clones.R[k].T @ z
        ok = state.clones.valid[k]
        B = B.at[i : i + 3, 0].set(jnp.where(ok, thk, 0.0))
        B = B.at[i + 3 : i + 6, 0].set(
            jnp.where(ok, cross_z(state.clones.p[k] - a), 0.0))
        B = B.at[i + 3 : i + 6, 1:4].set(
            jnp.where(ok, jnp.eye(3, dtype=dtype), 0.0))
    return B


def gauge_covariance(cfg: FilterConfig, state: FilterState, anchor=None):
    """(4, 4) covariance of the gauge coordinates: Sigma = B+ P B+^T."""
    B = gauge_basis(cfg, state, anchor)
    Bp = jnp.linalg.pinv(B)  # (4, D)
    S = Bp @ state.P @ Bp.T
    return 0.5 * (S + S.T)


def inflate_gauge(cfg: FilterConfig, state: FilterState, Q4, anchor=None) -> FilterState:
    """P <- P + B Q4 B^T: add gauge-subspace process covariance."""
    B = gauge_basis(cfg, state, anchor)
    P = state.P + B @ Q4 @ B.T
    return state.replace(P=0.5 * (P + P.T))


def _transport_gauge_cov(Q4, dpsi, lever):
    """Transport a gauge covariance across a yaw move and an anchor change.

    A yaw error about anchor a_j re-expressed about anchor a_K picks up a
    translation dp' = dp + psi z x (a_K - a_j): T = [[1, 0], [z x da, Rz]].
    """
    R = _rz(dpsi).astype(Q4.dtype)
    z = jnp.asarray([0.0, 0.0, 1.0], Q4.dtype)
    T = jnp.zeros((4, 4), Q4.dtype).at[0, 0].set(1.0).at[1:, 1:].set(R)
    T = T.at[1:, 0].set(jnp.cross(z, lever))
    return T @ Q4 @ T.T


# --------------------------------------------------------------------------
# iteration-0 boundary guesses: per-block IMU preintegration, composed
# --------------------------------------------------------------------------

class _Preint(NamedTuple):
    dR: jnp.ndarray  # (3, 3)
    dv: jnp.ndarray  # (3,)
    dp: jnp.ndarray  # (3,)
    dt: jnp.ndarray  # scalar


def _preint_compose(a: _Preint, b: _Preint) -> _Preint:
    """Gravity-free body-frame composition (associative)."""
    return _Preint(
        dR=a.dR @ b.dR,
        dv=a.dv + a.dR @ b.dv,
        dp=a.dp + a.dv * b.dt + a.dR @ b.dp,
        dt=a.dt + b.dt,
    )


def _block_preintegrate(cfg: FilterConfig, state0: FilterState, t, gyro, acc,
                        mask, t_start):
    """Midpoint-free forward Euler preintegration of one block's IMU stream.

    Bias-corrected with the iteration-0 bias estimates; accuracy only needs to
    seed the outer iteration (the blocks re-filter from these starts).
    """
    from ..math import so3

    dtype = state0.P.dtype
    bg, ba = state0.imu.bg, state0.imu.ba

    def step(carry, xs):
        pre, prev_t = carry
        ti, w, a, m = xs
        dt = jnp.where(m, jnp.clip(ti - prev_t, 0.0, 0.05), 0.0)
        w = w - bg
        a = a - ba
        pre2 = _Preint(
            dR=pre.dR @ so3.exp(w * dt),
            dv=pre.dv + pre.dR @ (a * dt),
            dp=pre.dp + pre.dv * dt + 0.5 * pre.dR @ (a * dt * dt),
            dt=pre.dt + dt,
        )
        return (pre2, jnp.where(m, ti, prev_t)), None

    init = _Preint(jnp.eye(3, dtype=dtype), jnp.zeros((3,), dtype),
                   jnp.zeros((3,), dtype), jnp.zeros((), dtype))
    (pre, _), _ = jax.lax.scan(step, (init, t_start), (t, gyro, acc, mask))
    return pre


def initial_starts(cfg: FilterConfig, state0: FilterState, frames: FrameInput,
                   n_blocks: int):
    """Iteration-0 block start states: preintegrate per block in parallel,
    compose across blocks, apply gravity once. Returns a (K,)-stacked
    FilterState pytree (block 0 = state0)."""
    K = n_blocks
    T = frames.t.shape[0]
    Tb = T // K
    dtype = state0.P.dtype
    g_w = jnp.asarray([0.0, 0.0, -cfg.gravity], dtype)

    # block start times: state0.t for block 0, last frame time of prior block
    t_starts = jnp.concatenate(
        [state0.t[None], frames.t[jnp.arange(1, K) * Tb - 1]]
    )
    flat = lambda x: x[: K * Tb].reshape(K, Tb * x.shape[1], *x.shape[2:])
    pres = jax.vmap(
        lambda t, w, a, m, ts: _block_preintegrate(cfg, state0, t, w, a, m, ts)
    )(flat(frames.imu_t), flat(frames.imu_gyro), flat(frames.imu_acc),
      flat(frames.imu_mask), t_starts)

    # prefix-compose: prefix[b] = Δ_0 ∘ ... ∘ Δ_{b-1} (identity for b = 0)
    ident = _Preint(jnp.eye(3, dtype=dtype), jnp.zeros((3,), dtype),
                    jnp.zeros((3,), dtype), jnp.zeros((), dtype))
    prefixes = [ident]
    for b in range(K - 1):
        prefixes.append(
            _preint_compose(prefixes[-1], jax.tree.map(lambda x: x[b], pres))
        )
    pre_k = jax.tree.map(lambda *xs: jnp.stack(xs), *prefixes)

    R0, v0, p0 = state0.imu.R, state0.imu.v, state0.imu.p

    def start_of(pre: _Preint, t_start):
        R = R0 @ pre.dR
        v = v0 + R0 @ pre.dv + g_w * pre.dt
        p = p0 + v0 * pre.dt + R0 @ pre.dp + 0.5 * g_w * pre.dt**2
        imu = state0.imu.replace(R=R, v=v, p=p)
        return state0.replace(
            imu=imu, imu_old=imu, imu_fej_now=imu, imu_fej_old=imu, t=t_start
        )

    return jax.vmap(start_of)(pre_k, t_starts)


# --------------------------------------------------------------------------
# the block-parallel replay
# --------------------------------------------------------------------------

def _block_frames(frames: FrameInput, n_blocks: int) -> FrameInput:
    """(T, ...) -> (K, T//K, ...); trailing remainder frames are dropped
    (callers pass T divisible by K)."""
    K = n_blocks
    T = frames.t.shape[0]
    Tb = T // K
    return jax.tree.map(lambda x: x[: K * Tb].reshape(K, Tb, *x.shape[1:]), frames)


def make_block_replay(cfg: FilterConfig, chi2_table):
    def replay(state, frames_block):
        def step(st, fr):
            return filter_step(cfg, st, fr, chi2_table)

        return jax.lax.scan(step, state, frames_block)

    return replay


def _stitch(cfg: FilterConfig, state0: FilterState, ends, old_starts):
    """Chain block results into next-iteration starts (runs replicated; O(K)
    small ops).

    For each boundary b: the best estimate of the state there is block b-1's
    end (the FULL pytree — covariance, clone window, feature table),
    gauge-moved by the correction block b-1's own start received this
    iteration (exact equivariance). Because the full state crosses one
    boundary per iteration and block 0 always starts exactly at ``state0``,
    block b is bit-exact serial once ``iteration >= b``.

    Returns (new_starts, deltas) stacked over K.
    """
    K = ends.t.shape[0]
    dtype = state0.P.dtype
    at = lambda tree, b: jax.tree.map(lambda x: x[b], tree)

    new_starts = [state0]
    deltas = [gauge_identity(dtype)]
    for b in range(1, K):
        end_prev = at(ends, b - 1)
        delta_prev = deltas[b - 1]
        m = gauge_diff(end_prev, at(old_starts, b))
        deltas.append(gauge_compose(delta_prev, m))
        new_starts.append(gauge_apply(cfg, end_prev, delta_prev))

    stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    return stack(new_starts), stack(deltas)


def seq_parallel_replay(cfg: FilterConfig, state0: FilterState,
                        frames: FrameInput, chi2_table, n_blocks: int,
                        n_iters: int = 3, mesh=None, axis: str = "sp",
                        gauge_cov_correction: bool = True):
    """Block-parallel replay of one trajectory.

    Returns (final end state, outs) with outs fields shaped (K*(T//K), ...),
    gauge-corrected so they are directly comparable to the serial replay.
    Requires ``cfg.ekf_feature_cap == 0`` (see module docstring).

    ``gauge_cov_correction``: at ``n_iters < n_blocks`` the end state's
    covariance has only traversed the last ``n_iters`` blocks, so it misses
    the unobservable-gauge (yaw + translation) random walk the serial filter
    accumulates over the earlier blocks — the observable subspace contracts
    to the serial answer, the gauge subspace cannot. The correction measures
    each block's own gauge-covariance increment from the final iteration's
    runs and adds the missing blocks' sum back into P (exactly zero when
    ``n_iters >= n_blocks``, preserving bit-exactness).
    """
    if cfg.ekf_feature_cap or cfg.nuisance_cap:
        # Permanent by design, not a missing feature: the stitch's
        # convergence argument needs every boundary-state coordinate to be
        # either (a) gauge-equivariant, or (b) locally observable so each
        # block re-estimates it from its own data. EKF-SLAM feature blocks
        # (and Schmidt nuisance clones) are neither: their P rows are keyed
        # to table rows whose identity is block-local (a track alive at the
        # b-1/b boundary occupies different rows — or no row — in block b's
        # table), so the handed-over feature covariance refers to states the
        # receiving block cannot re-associate, and the gauge composition has
        # no action on them. MSCKF marginalizes features immediately, which
        # is exactly what makes the boundary state gauge-decomposable.
        raise ValueError(
            "sequence-parallel mode requires an MSCKF configuration "
            "(ekf_feature_cap=0, nuisance_cap=0): EKF-SLAM/Schmidt keep "
            "per-feature covariance rows whose identity is block-local, so "
            "they can be neither gauge-composed nor re-estimated across a "
            "block boundary (see comment above)"
        )
    K = n_blocks
    fb = _block_frames(frames, K)
    replay = make_block_replay(cfg, chi2_table)

    if mesh is not None:
        try:
            from jax import shard_map
        except ImportError:
            from jax.experimental.shard_map import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        # check_vma=False: filter_step's scans mix fresh constants into the
        # carry, which the varying-manual-axes checker rejects; the program
        # has no cross-shard collectives so the check adds nothing here.
        blocks_fn = jax.jit(shard_map(
            jax.vmap(replay), mesh=mesh,
            in_specs=(P(axis), P(axis)), out_specs=(P(axis), P(axis)),
            check_vma=False,
        ))
        fb = jax.device_put(fb, NamedSharding(mesh, P(axis)))
    else:
        blocks_fn = jax.jit(jax.vmap(replay))

    stitch_fn = jax.jit(functools.partial(_stitch, cfg))

    starts = jax.jit(lambda s0, f: initial_starts(cfg, s0, f, K))(state0, frames)
    deltas = None
    ends = outs = prev_starts = None
    for _ in range(n_iters):
        prev_starts = starts
        ends, outs = blocks_fn(starts, fb)
        starts, deltas = stitch_fn(state0, ends, prev_starts)

    # final outputs: per-block gauge corrections applied to trajectories and
    # the sequence-end state (block K-1's end corrected by its start delta)
    @jax.jit
    def finalize(ends, outs, deltas):
        at = lambda tree, b: jax.tree.map(lambda x: x[b], tree)

        def fix_block(o, d: Gauge):
            R = _rz(d.psi).astype(o["p"].dtype)
            return {
                "p": jnp.einsum("ij,tj->ti", R, o["p"]) + d.dp,
                "R": jnp.einsum("ij,tjk->tik", R, o["R"]),
                "v": jnp.einsum("ij,tj->ti", R, o["v"]),
            }

        fixed = jax.vmap(fix_block)(
            {"p": outs.p, "R": outs.R, "v": outs.v}, deltas
        )
        flat = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), fixed)
        end = gauge_apply(cfg, at(ends, K - 1), at(deltas, K - 1))
        return end, flat

    end, flat = finalize(ends, outs, deltas)

    if gauge_cov_correction and n_iters < K:
        @jax.jit
        def correct(end, ends, prev_starts, deltas):
            # per-block increments in POSITION-ANCHORED gauge coordinates:
            # measure both ends of block j about the block-end position, then
            # lever-transport each missing block's increment to the final
            # anchor (yaw variance x lever loads onto translation)
            def one(e, s):
                a = e.imu.p
                return (gauge_covariance(cfg, e, a)
                        - gauge_covariance(cfg, s, a))

            d_sig = jax.vmap(one)(ends, prev_starts)  # (K, 4, 4)
            # PSD clip each increment (measurement updates can shrink the
            # projected covariance transiently)
            w, V = jnp.linalg.eigh(d_sig)
            d_sig = jnp.einsum("kij,kj,klj->kil", V, jnp.maximum(w, 0.0), V)
            a_end = end.imu.p
            psi_end = deltas.psi[K - 1]
            miss = jnp.arange(K) < (K - n_iters)
            q = jax.vmap(
                lambda Q, dpsi, a_j, m: jnp.where(
                    m, _transport_gauge_cov(Q, dpsi, a_end - a_j), 0.0)
            )(d_sig, psi_end - deltas.psi, ends.imu.p, miss)
            return inflate_gauge(cfg, end, jnp.sum(q, axis=0), a_end)

        end = correct(end, ends, prev_starts, deltas)
    extras = {
        k: getattr(outs, k).reshape((-1,) + getattr(outs, k).shape[2:])
        for k in ("t", "n_update_features", "dx_norm")
    }
    return end, {**extras, **flat}
