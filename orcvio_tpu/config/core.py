"""Typed configuration for the filter.

TPU-native replacement for the reference's cv::FileStorage YAML loading
(``src/orcvio.cpp:62-415`` loadParameters): a frozen dataclass whose fields are
*static* under jit (they select compiled branches / shapes), with YAML ingestion
of the reference's config files (same key names) in :mod:`orcvio_tpu.config.yaml_io`.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class FilterConfig:
    # --- static shape capacities (compile-time) ---
    sw_size: int = 20  # sliding-window clones (config/euroc.yaml: sw_size)
    max_features: int = 200  # feature-table capacity (>= max tracked per frame)
    max_update_features: int = 32  # max features stacked into one EKF update
    max_track_len: int = 6  # config: max_track_len
    min_track_len: int = 3  # minimum obs to use a feature (orcvio.cpp feature classification)
    imu_slab: int = 24  # max IMU samples per frame (20 Hz img / 200 Hz IMU + margin)

    # --- algorithm switches (reference flags, config/euroc.yaml:1-135) ---
    use_larvio: bool = False  # use_larvio_flag: RK4 vs closed-form SE(3) propagation
    use_left_perturbation: bool = True  # use_left_perturbation_flag
    use_closed_form_cov_prop: bool = False  # use_closed_form_cov_prop_flag
    if_fej: bool = False  # if_FEJ
    estimate_extrinsic: bool = False  # estimate_extrin
    estimate_td: bool = False  # estimate_td
    if_zupt: bool = False  # if_ZUPT_valid
    use_schmidt: bool = False  # use_schmidt: keep pruned anchors as nuisance states
    nuisance_cap: int = 0  # static capacity of Schmidt nuisance clone blocks
    schmidt_reference_semantics: bool = False  # replicate orcvio.cpp:1741-1756
    # exactly: full-gain (I-KH)P, restore the nuisance diagonal block, then
    # symmetrize (halving the cross-cov update). Default False = textbook
    # Schmidt (zero nuisance gain, consistent cross block) — see DEVIATIONS.md
    calib_imu: bool = False  # calib_imu_instrinsic: online Tg/As/Ma estimation
    prediction_only: bool = False  # prediction_only_flag: dead-reckon, no updates

    # --- noise densities (continuous), config keys noise_gyro etc. ---
    gyro_noise: float = 0.004
    acc_noise: float = 0.08
    gyro_bias_noise: float = 2e-6
    acc_bias_noise: float = 4e-5
    observation_noise: float = 0.035  # pixel-normalized meas sigma (feature_observation_noise)

    # --- initial covariance (config keys initial_covariance_*) ---
    init_cov_orientation: float = 4e-4
    init_cov_velocity: float = 0.25
    init_cov_position: float = 1.0
    init_cov_gyro_bias: float = 4e-4
    init_cov_acc_bias: float = 0.01
    init_cov_extrin_rot: float = 3e-4
    init_cov_extrin_trans: float = 2.5e-5
    init_cov_td: float = 4e-6
    init_cov_imu_intrinsic: float = 1e-4  # orcvio.cpp:222-225

    # --- misc ---
    gravity: float = 9.81  # GRAVITY_ACCELERATION (imu_state.h:20)
    td: float = 0.0
    chi2_confidence: float = 0.95
    huber_epsilon: float = 0.01  # triangulation LM huber (feature.hpp OptimizationConfig)
    zupt_max_feature_dis: float = 2e-3
    position_std_threshold: float = 8.0
    static_image_num: int = 20  # Static_Num (StaticInitializer.cpp)
    static_min_matches: int = 20  # min matched features per static frame (:41)
    static_outlier_ignore: int = 19  # top-k distances ignored as outliers (:46)

    # triangulation LM (feature.hpp:41-60 OptimizationConfig)
    tri_translation_threshold: float = 0.2
    tri_max_iters: int = 10
    tri_initial_damping: float = 1e-3

    # stacked-update form: "direct" (no compression; zero rows decouple in
    # S = H P H^T + sigma^2 I so it equals the compressed update exactly,
    # and the tall blocked-QR custom call disappears — measured 11.0 ->
    # 10.0 ms/step at B=16, 1.27 -> 1.21 ms at B=1 on TPU v5e, identical
    # trajectories), "qr" (reference SPQR analogue), "information"
    # (Lambda = H^T H; exact but ill-conditioned at f32 with small sigma),
    # or "chol" (Gram-Cholesky compression; NaN-prone on long f32 replays).
    # Crossover note: "direct" factors S of size m = 2*max_update_features*
    # max_track_len (384 at defaults) — O(m^3) — vs "qr"'s <= D-sized factor;
    # prefer "qr" when m grows >> D (large windows / many update features).
    update_form: str = "direct"

    # Joseph-form covariance update P <- (I-KH) P (I-KH)^T + sigma^2 K K^T:
    # unconditionally PSD-preserving where the economical (I-KH)P form
    # accumulates asymmetric roundoff on long f32 horizons (the 3600-frame
    # CPU-f32 replay diverges with the economical form; see
    # measurements/long_replay_3600.json). Two extra D x D matmuls per
    # update — cheap on the MXU. Applies to the row-form updates
    # (direct/qr/chol); Schmidt semantics keep their specialized forms.
    joseph_form: bool = False

    # object-residual update: transport the LM residual from its (stale)
    # linearization poses to the CURRENT clone estimates before the Kalman
    # step (r_now = r_lm + J_cam (wTc_now <- wTc_lm)). The reference feeds the
    # service-returned residual unchanged (orcvio.cpp:2017-2126), which biases
    # the update by the pose refinement accumulated since the LM ran — see
    # DEVIATIONS.md. False = literal reference semantics.
    object_residual_transport: bool = True
    # measurement sigma for object residual rows (0 = use observation_noise,
    # the literal reference semantics: "we just use feature observation noise
    # for all residuals", orcvio.cpp:2190). Object keypoints come from a CNN
    # and the LM residual additionally carries smoothing-induced temporal
    # correlation and the window-wide pose-drift spread, so a much larger
    # sigma than corner features is physically right. Default measured by the
    # round-4 triage sweep (scripts/object_update_triage.py) on the 12-car
    # sim world: at sigma 0.004 (feature noise) the update DEGRADES VIO ATE
    # 0.0617 -> 0.2702 m; at 0.05 it IMPROVES it to 0.0469 m.
    object_observation_noise: float = 0.05

    # gating / pruning
    prune_last_chance: bool = True  # "last-chance" MSCKF update on observations
    # dying with pruned clones (pruneImuStateBuffer, orcvio.cpp:2803-2851)
    max_grid_features: int = 0  # hybrid EKF-SLAM grid (0 = pure MSCKF)
    feature_idp_dim: int = 3  # 1 or 3 (1d/3d inverse-depth EKF features)
    ekf_feature_cap: int = 0  # EKF-SLAM feature state capacity (0 = pure MSCKF)

    @property
    def leg_dim(self) -> int:
        """Error-state dim of the IMU leg: theta v p bg ba + extrin(6) + td(1).

        The reference always uses 22 (orcvio.cpp:199) regardless of the
        estimate flags; the flags only gate initial covariance and Jacobian
        columns. We mirror that so covariance layouts match.
        """
        return 22

    @property
    def intrinsic_dim(self) -> int:
        """IMU-intrinsic error dims (calib_imu, orcvio.cpp:197 LEG_DIM=46).

        Layout [T1 T2 T3 | A1 A2 A3 | M1 M2] (3 each, orcvio.cpp:176-194):
        full Tg (gyro scale/misalignment), full As (g-sensitivity),
        lower-triangular Ma (acc scale/misalignment). Unlike the reference we
        place the block AFTER the EKF feature states, not inside the leg, so
        every existing offset (LEG=22, clones, features) is unchanged.
        """
        return 24 if self.calib_imu else 0

    @property
    def intrinsic_base(self) -> int:
        return (self.leg_dim + 6 * self.sw_size
                + self.feature_idp_dim * self.ekf_feature_cap)

    @property
    def state_dim(self) -> int:
        # leg + clones + EKF-SLAM feature states (1d/3d idp) + IMU intrinsics
        # + nuisance clones (last, so Schmidt tail slicing stays valid)
        return (self.leg_dim + 6 * self.sw_size
                + self.feature_idp_dim * self.ekf_feature_cap
                + self.intrinsic_dim
                + 6 * self.nuisance_cap)

    def initial_cov_diag(self) -> np.ndarray:
        d = np.zeros(self.state_dim)
        d[0:3] = self.init_cov_orientation
        d[3:6] = self.init_cov_velocity
        d[6:9] = self.init_cov_position
        d[9:12] = self.init_cov_gyro_bias
        d[12:15] = self.init_cov_acc_bias
        if self.estimate_extrinsic:
            d[15:18] = self.init_cov_extrin_rot
            d[18:21] = self.init_cov_extrin_trans
        if self.estimate_td:
            d[21] = self.init_cov_td
        if self.calib_imu:
            ib = self.intrinsic_base
            d[ib : ib + 24] = self.init_cov_imu_intrinsic
        return d

    def continuous_noise_cov(self) -> np.ndarray:
        """12x12 continuous-time noise covariance. Ref: orcvio.cpp:426-461."""
        q = np.zeros(12)
        q[0:3] = self.gyro_noise**2
        q[3:6] = self.acc_noise**2
        q[6:9] = self.gyro_bias_noise**2
        q[9:12] = self.acc_bias_noise**2
        return np.diag(q)
