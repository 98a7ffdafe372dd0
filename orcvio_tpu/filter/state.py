"""Filter state as a pure pytree with static shapes.

TPU-native redesign of the reference's ``StateServer`` (``orcvio.h:128-172``):
dynamic ``std::map`` clone/feature servers and ``conservativeResize``d
covariance become fixed-capacity ring buffers + validity masks and a
fixed-dimension covariance whose blocks are written in place. The whole state
is a pytree, so it jits, vmaps (many-sequence data parallelism), shards, and
checkpoints (orbax) for free.

Error-state layout (matches orcvio.cpp:201-222):
  [0:3]   theta        (orientation, left- or right-perturbation per config)
  [3:6]   v
  [6:9]   p
  [9:12]  bg
  [12:15] ba
  [15:21] extrinsic (theta_ic, t_ic)
  [21]    td
  [22 + 6*k : 28 + 6*k]  clone k: [theta_clone, p_clone]
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config.core import FilterConfig

LEG = 22
THETA = slice(0, 3)
VEL = slice(3, 6)
POS = slice(6, 9)
BG = slice(9, 12)
BA = slice(12, 15)


class ImuState(struct.PyTreeNode):
    """IMU mean state. Orientation stored as R: body->world (imu_state.h:53)."""

    R: jnp.ndarray  # (3, 3)
    v: jnp.ndarray  # (3,)
    p: jnp.ndarray  # (3,)
    bg: jnp.ndarray  # (3,)
    ba: jnp.ndarray  # (3,)

    @classmethod
    def identity(cls, dtype=jnp.float32, xp=jnp):
        z = xp.zeros(3, dtype)
        return cls(R=xp.eye(3, dtype=dtype), v=z, p=z, bg=z, ba=z)


class CloneStates(struct.PyTreeNode):
    """Sliding-window IMU pose clones, ring-buffer layout (slot != age).

    Replaces ``imu_states_augment`` (imu_state.h:103 IMUState_Aug +
    std::map server). ``order`` is a monotonically increasing insertion
    counter used to recover temporal order without shifting memory.
    """

    R: jnp.ndarray  # (SW, 3, 3) body->world at clone time
    p: jnp.ndarray  # (SW, 3)
    p_fej: jnp.ndarray  # (SW, 3) first-estimate position
    t: jnp.ndarray  # (SW,) timestamp
    order: jnp.ndarray  # (SW,) int32 insertion counter, -1 = invalid
    valid: jnp.ndarray  # (SW,) bool

    @classmethod
    def empty(cls, sw: int, dtype=jnp.float32, xp=jnp):
        return cls(
            R=xp.tile(xp.eye(3, dtype=dtype), (sw, 1, 1)),
            p=xp.zeros((sw, 3), dtype),
            p_fej=xp.zeros((sw, 3), dtype),
            t=xp.zeros((sw,), dtype),
            order=-xp.ones((sw,), xp.int32),
            valid=xp.zeros((sw,), bool),
        )


class FeatureTable(struct.PyTreeNode):
    """Per-feature observations aligned to clone slots.

    Replaces the MSCKF ``Feature.observations`` map keyed by state id
    (feature.hpp:206): obs[f, c] is the normalized (u, v) of feature f in
    clone slot c, with obs_valid[f, c] the mask. Feature identity is a row;
    rows are recycled when features die.
    """

    uv: jnp.ndarray  # (F, SW, 2) normalized image coords
    uv_vel: jnp.ndarray  # (F, SW, 2) normalized image velocity (for td column)
    uv_valid: jnp.ndarray  # (F, SW) bool
    fid: jnp.ndarray  # (F,) int32 external track id, -1 = free row
    active: jnp.ndarray  # (F,) bool — still being tracked this frame
    # hybrid EKF-SLAM feature states (Feature.in_state/invParam/id_anchor,
    # feature.hpp:206-260)
    in_state: jnp.ndarray  # (F,) bool — feature lives in the covariance
    state_slot: jnp.ndarray  # (F,) int32 EKF block slot, -1 = none
    anchor_slot: jnp.ndarray  # (F,) int32 clone slot of the anchor camera
    idp: jnp.ndarray  # (F, 3) inverse-depth params (alpha, beta, rho) in anchor cam

    @classmethod
    def empty(cls, f_cap: int, sw: int, dtype=jnp.float32, xp=jnp):
        return cls(
            uv=xp.zeros((f_cap, sw, 2), dtype),
            uv_vel=xp.zeros((f_cap, sw, 2), dtype),
            uv_valid=xp.zeros((f_cap, sw), bool),
            fid=-xp.ones((f_cap,), xp.int32),
            active=xp.zeros((f_cap,), bool),
            in_state=xp.zeros((f_cap,), bool),
            state_slot=-xp.ones((f_cap,), xp.int32),
            anchor_slot=-xp.ones((f_cap,), xp.int32),
            idp=xp.zeros((f_cap, 3), dtype),
        )


class NuiClones(struct.PyTreeNode):
    """Schmidt nuisance clone states (nui_imu_states, orcvio.h:167-170).

    Means are frozen; covariance blocks live after the EKF feature blocks.
    """

    R: jnp.ndarray  # (N, 3, 3)
    p: jnp.ndarray  # (N, 3)
    t: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,)

    @classmethod
    def empty(cls, n: int, dtype=jnp.float32, xp=jnp):
        # at least one (masked) row: zero-size leaves break orbax checkpoints
        m = max(n, 1)
        return cls(
            R=xp.tile(xp.eye(3, dtype=dtype), (m, 1, 1)),
            p=xp.zeros((m, 3), dtype),
            t=xp.zeros((m,), dtype),
            valid=xp.zeros((m,), bool),
        )


class FilterState(struct.PyTreeNode):
    """The complete filter state pytree (StateServer equivalent)."""

    t: jnp.ndarray  # scalar time of imu state
    imu: ImuState
    imu_old: ImuState  # state before last propagation step (orcvio.h: imu_state_old)
    imu_fej_now: ImuState
    imu_fej_old: ImuState
    td: jnp.ndarray  # scalar
    R_b2c: jnp.ndarray  # (3, 3) imu->camera rotation (imu_state.h:66)
    t_c_b: jnp.ndarray  # (3,) camera position in imu frame
    clones: CloneStates
    features: FeatureTable
    P: jnp.ndarray  # (D, D) error-state covariance
    next_order: jnp.ndarray  # int32 clone insertion counter
    initialized: jnp.ndarray  # bool — static/dynamic init done
    last_gyro: jnp.ndarray  # (3,) last raw gyro (m_gyro_old, orcvio.cpp:703)
    last_acc: jnp.ndarray  # (3,) last raw acc
    nui: "NuiClones"  # Schmidt nuisance clones (empty when nuisance_cap = 0)
    # IMU intrinsics (calib_imu; orcvio.h:155-157 Tg/As/Ma). Model:
    # acc = Ma (a_m - ba); gyro = Tg (w_m - As acc - bg) (orcvio.cpp:732-746)
    Tg: jnp.ndarray  # (3, 3) gyro scale/misalignment
    As: jnp.ndarray  # (3, 3) gyro g-sensitivity
    Ma: jnp.ndarray  # (3, 3) acc scale/misalignment (lower triangular)

    @classmethod
    def create(cls, cfg: FilterConfig, dtype=jnp.float32):
        return cls._create(cfg, dtype, jnp)

    @classmethod
    def create_host(cls, cfg: FilterConfig, dtype=np.float32):
        """Numpy-leaf state: zero device dispatches/compiles at setup time.

        On the tunneled TPU backend every eager op costs ~1 s of compile
        latency, so the ~40 ops of create() take >10 s there; host leaves
        are transferred by the first jit call that consumes the state.
        """
        return cls._create(cfg, np.dtype(dtype), np)

    @classmethod
    def _create(cls, cfg: FilterConfig, dtype, xp):
        imu = ImuState.identity(dtype, xp)
        P = xp.diag(xp.asarray(cfg.initial_cov_diag(), dtype))
        return cls(
            t=xp.zeros((), dtype),
            imu=imu,
            imu_old=imu,
            imu_fej_now=imu,
            imu_fej_old=imu,
            td=xp.asarray(cfg.td, dtype),
            R_b2c=xp.eye(3, dtype=dtype),
            t_c_b=xp.zeros(3, dtype),
            clones=CloneStates.empty(cfg.sw_size, dtype, xp),
            features=FeatureTable.empty(cfg.max_features, cfg.sw_size, dtype, xp),
            P=P,
            next_order=xp.zeros((), xp.int32),
            initialized=xp.zeros((), bool),
            last_gyro=xp.zeros(3, dtype),
            last_acc=xp.zeros(3, dtype),
            nui=NuiClones.empty(cfg.nuisance_cap, dtype, xp),
            Tg=xp.eye(3, dtype=dtype),
            As=xp.zeros((3, 3), dtype),
            Ma=xp.eye(3, dtype=dtype),
        )


def clone_slice(slot: int):
    return slice(LEG + 6 * slot, LEG + 6 * (slot + 1))


# IMU-intrinsic error-vector packing, order [T1 T2 T3 | A1 A2 A3 | M1 M2]
# (orcvio.cpp:176-194 / updateImuMx :4373): X1 = below-diag (1,0),(2,0),(2,1);
# X2 = diag; X3 = above-diag (0,1),(0,2),(1,2). Ma has no upper part.
_LO = ((1, 0), (2, 0), (2, 1))
_DI = ((0, 0), (1, 1), (2, 2))
_UP = ((0, 1), (0, 2), (1, 2))


def imu_intrinsics_to_vec(Tg, As, Ma):
    def pick(M, idx):
        return jnp.stack([M[i, j] for i, j in idx])

    return jnp.concatenate([
        pick(Tg, _LO), pick(Tg, _DI), pick(Tg, _UP),
        pick(As, _LO), pick(As, _DI), pick(As, _UP),
        pick(Ma, _LO), pick(Ma, _DI),
    ])


def apply_imu_intrinsics_delta(Tg, As, Ma, d24):
    def add(M, idx, v):
        for k, (i, j) in enumerate(idx):
            M = M.at[i, j].add(v[k])
        return M

    Tg = add(add(add(Tg, _LO, d24[0:3]), _DI, d24[3:6]), _UP, d24[6:9])
    As = add(add(add(As, _LO, d24[9:12]), _DI, d24[12:15]), _UP, d24[15:18])
    Ma = add(add(Ma, _LO, d24[18:21]), _DI, d24[21:24])
    return Tg, As, Ma
