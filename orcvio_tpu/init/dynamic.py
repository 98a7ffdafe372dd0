"""Dynamic (motion-based) visual-inertial initialization.

TPU-native equivalent of the reference's VINS-Mono-style dynamic initializer
(``src/DynamicInitializer.cpp`` tryDynInit/initialStructure/visualInitialAlign,
``src/solve_5pts.cpp`` relative pose, ``src/initial_sfm.cpp`` window SfM,
``src/initial_alignment.cpp`` gyro-bias / gravity / scale / velocity solve,
``include/Initializer/ImuPreintegration.h`` preintegration): a sliding window
of frames with feature tracks is reconstructed up to scale (essential-matrix
relative pose + batched triangulation + batched GN PnP instead of the
reference's Ceres BA), then aligned with the IMU preintegration by linear
least squares. All stages are batched, fixed-iteration, jit-compatible.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config.core import FilterConfig
from ..filter.state import ImuState
from ..frontend.ransac import ransac_fundamental
from ..math import so3
from .preintegration import Preintegration, preintegrate_sequence


# ---------------------------------------------------------------------------
# Two-view geometry
# ---------------------------------------------------------------------------

def decompose_essential(E, p1, p2, valid):
    """E -> (R, t) with cheirality voting. Ref: solve_5pts.cpp:29 (recoverPose).

    Returns (R_12, t_12, n_good): transform taking frame-1 coords to frame-2
    (p2_cam = R p1_cam + t), |t| = 1.
    """
    U, S, Vt = jnp.linalg.svd(E)
    # proper rotations
    d1 = jnp.linalg.det(U @ Vt)
    U = U * jnp.asarray([1.0, 1.0, 1.0])[None, :]
    W = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    t = U[:, 2]

    def count_good(R, tt):
        # midpoint-free two-view triangulation in frame 1
        f1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=1)
        f2 = jnp.concatenate([p2, jnp.ones_like(p2[:, :1])], axis=1)
        # depth of point along f1: solve [f1, -R^T f2] [d1; d2] = R^T t ... use
        # standard: d1 * f1 = R^T (d2 * f2 - t)  =>  cross terms; linear 2x2
        Rf2 = jnp.einsum("ji,nj->ni", R, f2)  # R^T f2
        Rt = jnp.einsum("ji,j->i", R, tt)  # R^T t
        a11 = jnp.sum(f1 * f1, axis=1)
        a12 = -jnp.sum(f1 * Rf2, axis=1)
        a22 = jnp.sum(Rf2 * Rf2, axis=1)
        b1 = -jnp.sum(f1 * Rt, axis=1)
        b2 = jnp.sum(Rf2 * Rt, axis=1)
        det = a11 * a22 - a12 * a12
        det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        d1 = (b1 * a22 - b2 * a12) / det
        d2 = (a11 * b2 - a12 * b1) / det
        good = (d1 > 0) & (d2 > 0) & valid
        return jnp.sum(good)

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    counts = jnp.stack([count_good(R, tt) for R, tt in cands])
    best = jnp.argmax(counts)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best], counts[best]


def triangulate_dlt(cTw, uv, mask):
    """Batched multi-view DLT. cTw: (K, 4, 4); uv: (N, K, 2); mask: (N, K).

    Returns (p_w (N, 3), ok (N,)). Rows of the DLT system are masked to zero.
    """
    P = cTw[:, :3, :]  # (K, 3, 4)
    u = uv[..., 0]
    v = uv[..., 1]
    r1 = u[..., None] * P[None, :, 2, :] - P[None, :, 0, :]  # (N, K, 4)
    r2 = v[..., None] * P[None, :, 2, :] - P[None, :, 1, :]
    A = jnp.concatenate([r1, r2], axis=1)  # (N, 2K, 4)
    A = A * jnp.concatenate([mask, mask], axis=1)[..., None]
    _, s, Vt = jnp.linalg.svd(A, full_matrices=False)
    X = Vt[:, -1, :]
    ok = jnp.abs(X[:, 3]) > 1e-8
    p = X[:, :3] / jnp.where(ok, X[:, 3], 1.0)[:, None]
    n_obs = jnp.sum(mask, axis=1)
    return p, ok & (n_obs >= 2)


def pnp_gn(p_w, uv, mask, cTw0, iters: int = 10):
    """Pose-only GN refinement of cTw. p_w: (N, 3); uv: (N, 2); mask: (N,)."""

    def step(cTw, _):
        R = cTw[:3, :3]
        t = cTw[:3, 3]
        pc = jnp.einsum("ij,nj->ni", R, p_w) + t
        z = jnp.maximum(pc[:, 2], 1e-3)
        zhat = pc[:, :2] / z[:, None]
        r = (uv - zhat) * mask[:, None]
        # d zhat / d twist (left perturbation of cTw: cTw' = exp(xi) cTw)
        inv_z = 1.0 / z
        dpi = jnp.stack(
            [
                jnp.stack([inv_z, jnp.zeros_like(z), -pc[:, 0] * inv_z**2], -1),
                jnp.stack([jnp.zeros_like(z), inv_z, -pc[:, 1] * inv_z**2], -1),
            ],
            axis=1,
        )  # (N, 2, 3)
        # d pc / d xi = [I | -hat(pc)]
        dpc = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (pc.shape[0], 3, 3)), -so3.hat(pc)],
            axis=2,
        )  # (N, 3, 6)
        J = (dpi @ dpc) * mask[:, None, None]  # (N, 2, 6)
        A = jnp.einsum("nik,nil->kl", J, J) + 1e-8 * jnp.eye(6, dtype=pc.dtype)
        b = jnp.einsum("nik,ni->k", J, r)
        xi = jnp.linalg.solve(A, b)
        from ..math import se3 as se3m

        return se3m.exp(xi) @ cTw, jnp.sum(r * r)

    cTw, costs = jax.lax.scan(step, cTw0, None, length=iters)
    return cTw, costs[-1]


# ---------------------------------------------------------------------------
# Window SfM + alignment
# ---------------------------------------------------------------------------

def bundle_adjust(cTw, p_w, uv, mask, fixed_frame: int, iters: int = 12, lam: float = 1e-4):
    """Joint pose+point GN with the point-block Schur complement.

    The TPU-native stand-in for the reference's Ceres BA (initial_sfm.h:70):
    per-point 3x3 blocks are eliminated in closed form (batched Cramer),
    leaving one dense 6K x 6K pose system per iteration. The monocular scale
    gauge is handled by damping + renormalizing the trajectory extent.
    """
    from ..math import se3 as se3m

    N, K, _ = uv.shape
    dtype = uv.dtype
    anchor_extent = jnp.linalg.norm(se3m.inverse_pose(cTw)[K - 1, :3, 3])

    def solve3(A, b):
        return jnp.linalg.solve(A + 1e-10 * jnp.eye(3, dtype=dtype), b)

    def step(carry, _):
        cTw, p_w = carry
        R = cTw[:, :3, :3]
        t = cTw[:, :3, 3]
        pc = jnp.einsum("kij,nj->nki", R, p_w) + t[None]  # (N, K, 3)
        z = jnp.maximum(pc[..., 2], 1e-3)
        zhat = pc[..., :2] / z[..., None]
        r = (uv - zhat) * mask[..., None]  # (N, K, 2)
        inv_z = 1.0 / z
        dpi = jnp.stack(
            [
                jnp.stack([inv_z, jnp.zeros_like(z), -pc[..., 0] * inv_z**2], -1),
                jnp.stack([jnp.zeros_like(z), inv_z, -pc[..., 1] * inv_z**2], -1),
            ],
            axis=-2,
        )  # (N, K, 2, 3)
        eyeN = jnp.broadcast_to(jnp.eye(3, dtype=dtype), pc.shape + (3,))
        dpc_pose = jnp.concatenate([eyeN, -so3.hat(pc)], axis=-1)  # (N, K, 3, 6)
        Jx = (dpi @ dpc_pose) * mask[..., None, None]  # (N, K, 2, 6)
        Jp = jnp.einsum("nkij,kjl->nkil", dpi, R) * mask[..., None, None]  # (N, K, 2, 3)

        U = jnp.einsum("nkia,nkib->kab", Jx, Jx)  # (K, 6, 6)
        V = jnp.einsum("nkia,nkib->nab", Jp, Jp)  # (N, 3, 3)
        Wb = jnp.einsum("nkia,nkib->knab", Jx, Jp)  # (K, N, 6, 3)
        gx = jnp.einsum("nkia,nki->ka", Jx, r)  # (K, 6)
        gp = jnp.einsum("nkia,nki->na", Jp, r)  # (N, 3)

        Vd = V + (lam + 1e-6) * jnp.eye(3, dtype=dtype)
        Vinv = jnp.linalg.inv(Vd)  # (N, 3, 3) tiny blocks
        # Schur: S_{k,k'} = U_k delta - sum_n W_{k,n} Vinv_n W_{k',n}^T
        WVi = jnp.einsum("knab,nbc->knac", Wb, Vinv)  # (K, N, 6, 3)
        S = -jnp.einsum("knac,lnbc->klab", WVi, Wb)  # (K, K, 6, 6)
        S = S.at[jnp.arange(K), jnp.arange(K)].add(U + lam * jnp.eye(6, dtype=dtype))
        rhs = gx - jnp.einsum("knac,nc->ka", WVi, gp)  # (K, 6)
        # fix the gauge frame: identity row/col
        S = S.at[fixed_frame, :].set(0.0).at[:, fixed_frame].set(0.0)
        S = S.at[fixed_frame, fixed_frame].set(jnp.eye(6, dtype=dtype))
        rhs = rhs.at[fixed_frame].set(0.0)
        Sd = S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
        dx = jnp.linalg.solve(Sd, rhs.reshape(-1)).reshape(K, 6)
        # back-substitute points
        dp = jnp.einsum("nab,nb->na", Vinv, gp - jnp.einsum("knab,ka->nb", Wb, dx))
        cTw2 = jax.vmap(lambda x, T: se3m.exp(x) @ T)(dx, cTw)
        p2 = p_w + dp
        # renormalize the scale gauge to the anchor extent
        wTc2 = se3m.inverse_pose(cTw2)
        ext = jnp.maximum(jnp.linalg.norm(wTc2[K - 1, :3, 3]), 1e-9)
        scale = anchor_extent / ext
        wTc2 = wTc2.at[:, :3, 3].multiply(scale)
        p2 = p2 * scale
        return (se3m.inverse_pose(wTc2), p2), jnp.sum(r * r)

    (cTw, p_w), costs = jax.lax.scan(step, (cTw, p_w), None, length=iters)
    return cTw, p_w, costs


class SfmResult(NamedTuple):
    R_c0_ck: jnp.ndarray  # (K, 3, 3) camera k rotation in the c0 (ref) frame
    p_c0_ck: jnp.ndarray  # (K, 3) camera centers, unscaled
    ok: jnp.ndarray


def window_sfm(uv, obs_mask, key, parallax_ref: int = 0):
    """Up-to-scale reconstruction of a K-frame window.

    uv: (N, K, 2) normalized feature tracks; obs_mask: (N, K). Frame
    `parallax_ref` (default 0) and the last frame anchor the relative pose
    (the reference picks the first frame with enough parallax,
    DynamicInitializer.cpp:330 relativePose; callers should pass a frame
    satisfying that).
    """
    N, K, _ = uv.shape
    l = parallax_ref
    both = obs_mask[:, l] & obs_mask[:, K - 1]
    p1 = uv[:, l]
    p2 = uv[:, K - 1]
    inl, E = ransac_fundamental(p1, p2, both, key, n_hyp=256, thresh=3e-5)
    R_rel, t_rel, n_good = decompose_essential(E, p1, p2, inl)
    # camera l = identity; camera K-1 pose: p2_cam = R_rel p1_cam + t_rel
    # => cTw for frame K-1 (world = camera-l frame): [R_rel | t_rel]
    from ..math import se3 as se3m

    eye = jnp.eye(4, dtype=uv.dtype)
    cTw = jnp.tile(eye, (K, 1, 1))
    cTw = cTw.at[K - 1, :3, :3].set(R_rel)
    cTw = cTw.at[K - 1, :3, 3].set(t_rel)

    # triangulate from the anchor pair, then PnP every other frame, then
    # re-triangulate with all poses and re-PnP (2 sweeps of alternation)
    pair_mask = jnp.zeros((N, K), bool).at[:, l].set(both).at[:, K - 1].set(both)
    p_w, ok3d = triangulate_dlt(cTw, uv, pair_mask & inl[:, None])

    def pnp_all(cTw, p_w, ok3d):
        def one(k):
            m = obs_mask[:, k] & ok3d
            # initial guess: previous estimate
            return pnp_gn(p_w, uv[:, k], m, cTw[k])[0]

        return jax.vmap(one)(jnp.arange(K))

    for _ in range(2):
        cTw = pnp_all(cTw, p_w, ok3d)
        # keep the anchor frame at identity (gauge)
        cTw = cTw.at[l].set(eye)
        p_w, ok3d = triangulate_dlt(cTw, uv, obs_mask)

    # joint refinement (the reference's Ceres BA stage, initial_sfm.h:70)
    ba_mask = obs_mask & ok3d[:, None]
    cTw, p_w, ba_costs = bundle_adjust(cTw, p_w, uv, ba_mask, fixed_frame=l)

    wTc = se3m.inverse_pose(cTw)
    ok = (n_good > 12) & (jnp.sum(ok3d) > 20)
    return SfmResult(R_c0_ck=wTc[:, :3, :3], p_c0_ck=wTc[:, :3, 3], ok=ok), p_w, ok3d


def solve_gyro_bias(pre: Preintegration, R_b_seq, gap_mask):
    """Gyro bias from rotation consistency. Ref: initial_alignment.cpp solveGyroscopeBias.

    R_b_seq: (K, 3, 3) body rotations from vision (R_c0_bk); gap k uses
    preintegration row k (gap k-1 -> k).
    """
    K = R_b_seq.shape[0]
    dR_vis = jnp.einsum("kji,kjl->kil", R_b_seq[:-1], R_b_seq[1:])  # R_k^T R_{k+1}
    r = so3.log(jnp.einsum("kji,kjl->kil", pre.dR[1:], dR_vis))  # log(dR_pre^T dR_vis)
    J = pre.J_q_bg[1:]  # (K-1, 3, 3)
    m = gap_mask[1:].astype(r.dtype)
    A = jnp.einsum("kij,kil,k->jl", J, J, m) + 1e-8 * jnp.eye(3, dtype=r.dtype)
    b = jnp.einsum("kij,ki,k->j", J, r, m)
    return jnp.linalg.solve(A, b)


def linear_alignment(pre: Preintegration, R_c0_bk, p_c0_ck, t_c_b_in_body, dt_gaps, gap_mask, gravity=9.81):
    """Solve velocities, gravity (in c0), and scale. Ref: initial_alignment.cpp LinearAlignment.

    R_c0_bk: (K, 3, 3) body-to-c0 rotations; p_c0_ck: (K, 3) camera centers
    (unscaled); t_c_b_in_body: camera position in the body frame (TIC).
    Unknowns x = [v_b0..v_b{K-1} (3K), g_c0 (3), s (1)].
    """
    K = R_c0_bk.shape[0]
    dtype = p_c0_ck.dtype
    n_x = 3 * K + 4
    rows = []
    rhs = []
    for k in range(K - 1):
        dt = dt_gaps[k + 1]
        Rk_inv = jnp.swapaxes(R_c0_bk[k], -1, -2)  # c0 -> bk
        Hp = jnp.zeros((3, n_x), dtype)
        Hp = Hp.at[:, 3 * k : 3 * k + 3].set(-dt * jnp.eye(3, dtype=dtype))
        Hp = Hp.at[:, 3 * K : 3 * K + 3].set(0.5 * dt * dt * Rk_inv)
        Hp = Hp.at[:, 3 * K + 3].set(jnp.einsum("ij,j->i", Rk_inv, p_c0_ck[k + 1] - p_c0_ck[k]))
        bp = (
            pre.dp[k + 1]
            + jnp.einsum("ij,jk,k->i", Rk_inv, R_c0_bk[k + 1], t_c_b_in_body)
            - t_c_b_in_body
        )
        Hv = jnp.zeros((3, n_x), dtype)
        Hv = Hv.at[:, 3 * k : 3 * k + 3].set(-jnp.eye(3, dtype=dtype))
        Hv = Hv.at[:, 3 * (k + 1) : 3 * (k + 1) + 3].set(
            jnp.einsum("ij,jk->ik", Rk_inv, R_c0_bk[k + 1])
        )
        Hv = Hv.at[:, 3 * K : 3 * K + 3].set(dt * Rk_inv)
        bv = pre.dv[k + 1]
        m = gap_mask[k + 1].astype(dtype)
        rows += [Hp * m, Hv * m]
        rhs += [bp * m, bv * m]
    H = jnp.concatenate(rows, axis=0)
    b = jnp.concatenate(rhs, axis=0)
    A = H.T @ H + 1e-10 * jnp.eye(n_x, dtype=dtype)
    x = jnp.linalg.solve(A, H.T @ b)
    vels = x[: 3 * K].reshape(K, 3)
    g_c0 = x[3 * K : 3 * K + 3]
    s = x[3 * K + 3]
    ok = (s > 1e-3) & (jnp.abs(jnp.linalg.norm(g_c0) - gravity) < 0.5 * gravity)
    return vels, g_c0, s, ok


class DynamicInitResult(NamedTuple):
    imu: ImuState  # gravity-aligned initial state at the LAST window frame
    scale: jnp.ndarray
    ok: jnp.ndarray


def dynamic_initialize(cfg: FilterConfig, uv, obs_mask, imu_t, gyro, acc, imu_mask,
                       R_b2c, t_c_b, key):
    """Full dynamic init over a K-frame window. Ref: tryDynInit (DynamicInitializer.cpp:20).

    uv: (N, K, 2) tracks; imu slabs (K, S, ...): slab k covers gap (k-1, k].
    Returns the initial ImuState expressed in a gravity-aligned world frame
    whose origin/yaw are the last window camera (up to the monocular gauge).
    """
    K = uv.shape[1]
    dtype = uv.dtype
    sfm, p_w, ok3d = window_sfm(uv, obs_mask, key)
    # body rotations in c0: R_c0_bk = R_c0_ck @ R_b2c (cam->body is R_b2c^T... )
    # wTc = wTb @ bTc, with bTc = (R_b2c^T, t_c_b) => R_c0_bk = R_c0_ck @ R_b2c
    R_c0_bk = jnp.einsum("kij,jl->kil", sfm.R_c0_ck, R_b2c)

    pre0 = preintegrate_sequence(imu_t, gyro, acc, imu_mask)
    gap_mask = jnp.sum(imu_mask, axis=1) > 0
    dbg = solve_gyro_bias(pre0, R_c0_bk, gap_mask)
    pre = preintegrate_sequence(imu_t, gyro, acc, imu_mask, bg=dbg)

    vels, g_c0, s, align_ok = linear_alignment(
        pre, R_c0_bk, sfm.p_c0_ck, t_c_b, pre.dt, gap_mask, cfg.gravity
    )

    # gravity-align: the solved g_c0 is the NEGATIVE of the world gravity
    # vector (the preintegration identity dv = R^T(dv_w - g_w dt) puts it on
    # the + side of the linear model) — map it to +z, exactly as the
    # reference/VINS g2R does (initial_alignment.cpp).
    g_norm = jnp.maximum(jnp.linalg.norm(g_c0), 1e-9)
    a = g_c0 / g_norm
    b = jnp.asarray([0.0, 0.0, 1.0], dtype)
    v = jnp.cross(a, b)
    c = jnp.dot(a, b)
    vn = jnp.linalg.norm(v)
    axis = jnp.where(vn > 1e-9, v / jnp.maximum(vn, 1e-9), jnp.asarray([1.0, 0, 0], dtype))
    ang = jnp.arctan2(vn, c)
    R_w_c0 = so3.exp(axis * ang)

    k_last = K - 1
    R0 = R_w_c0 @ R_c0_bk[k_last]
    v0 = jnp.einsum("ij,jk,k->i", R_w_c0, R_c0_bk[k_last], vels[k_last])
    p0 = jnp.zeros(3, dtype)
    imu0 = ImuState(R=R0, v=v0, p=p0, bg=dbg, ba=jnp.zeros(3, dtype))
    ok = sfm.ok & align_ok & jnp.all(jnp.isfinite(R0)) & jnp.all(jnp.isfinite(v0))
    return DynamicInitResult(imu=imu0, scale=s, ok=ok)


def build_tracks(fids, uvs, meas_mask, n_cap: int = 80):
    """Stack per-frame (fid, uv) measurement arrays into (N, K, 2) tracks.

    Host-side helper (numpy) for the window-SfM input; equivalent of the
    reference's feature_manager window bookkeeping (feature_manager.h:88).
    fids/uvs/meas_mask: (K, M[, 2]) arrays.
    """
    import numpy as np

    fids = np.asarray(fids)
    uvs = np.asarray(uvs)
    meas_mask = np.asarray(meas_mask)
    K = fids.shape[0]
    counts = {}
    for k in range(K):
        for f in fids[k][meas_mask[k]]:
            counts[int(f)] = counts.get(int(f), 0) + 1
    ids = [f for f, c in sorted(counts.items(), key=lambda kv: -kv[1]) if c >= 2][:n_cap]
    id_to_row = {f: i for i, f in enumerate(ids)}
    N = max(len(ids), 8)
    uv = np.zeros((N, K, 2))
    m = np.zeros((N, K), bool)
    for k in range(K):
        for j in range(fids.shape[1]):
            f = int(fids[k, j])
            if meas_mask[k, j] and f in id_to_row:
                uv[id_to_row[f], k] = uvs[k, j]
                m[id_to_row[f], k] = True
    return uv, m


def flexible_dynamic_attempt(cfg, window_frames, R_b2c, t_c_b, key, min_tracks: int = 25):
    """One dynamic-init attempt over a list of FrameInput (host wrapper).

    The FlexibleInitializer fallback (FlexibleInitializer.cpp:10-26): called
    by the runner when the static initializer has not fired. Returns
    DynamicInitResult (ok=False if the window is unusable).
    """
    import numpy as np
    import jax.numpy as jnp

    K = len(window_frames)
    fids = np.stack([np.asarray(f.fids) for f in window_frames])
    uvs = np.stack([np.asarray(f.uvs) for f in window_frames])
    mm = np.stack([np.asarray(f.meas_mask) for f in window_frames])
    uv, m = build_tracks(fids, uvs, mm)
    if m.sum() < min_tracks * 2:
        return None
    imu_t = jnp.stack([f.imu_t for f in window_frames])
    gyro = jnp.stack([f.imu_gyro for f in window_frames])
    acc = jnp.stack([f.imu_acc for f in window_frames])
    imask = jnp.stack([f.imu_mask for f in window_frames])
    return dynamic_initialize(
        cfg, jnp.asarray(uv), jnp.asarray(m), imu_t, gyro, acc, imask,
        jnp.asarray(R_b2c), jnp.asarray(t_c_b), key,
    )
