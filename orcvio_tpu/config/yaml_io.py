"""Ingest the reference's OpenCV-FileStorage YAML configs.

Same key names as the reference (config/euroc.yaml etc., read by
``loadParameters`` orcvio.cpp:62-415 and image_processor.cpp:44-113), so a
user can point this framework at an unmodified reference config file.
Host-side only (cv2.FileStorage); produces the typed FilterConfig /
CameraConfig dataclasses.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .core import FilterConfig


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    width: int = 752
    height: int = 480
    fx: float = 458.654
    fy: float = 457.296
    cx: float = 367.215
    cy: float = 248.375
    distortion_model: str = "radtan"  # "radtan" | "equidistant"
    dist_coeffs: tuple = (0.0, 0.0, 0.0, 0.0)
    # T_cam_imu: camera_T_imu (Kalibr convention, takes imu-frame vectors to
    # camera frame) — orcvio.cpp:229-247
    R_b2c: tuple = tuple(map(tuple, np.eye(3)))
    t_c_b: tuple = (0.0, 0.0, 0.0)

    @property
    def K(self):
        return np.array([[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1.0]])


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    pyramid_levels: int = 2
    patch_size: int = 21
    fast_threshold: int = 30
    max_iteration: int = 30
    track_precision: float = 0.01
    ransac_threshold: float = 1.0
    max_features_num: int = 200
    min_distance: int = 20
    flag_equalize: bool = True
    pub_frequency: float = 10.0


def _get(fs, key, default):
    node = fs.getNode(key)
    if node.empty():
        return default
    if isinstance(default, bool):
        return bool(int(node.real()))
    if isinstance(default, int):
        return int(node.real())
    if isinstance(default, float):
        return float(node.real())
    if isinstance(default, str):
        return node.string()
    return default


def load_reference_yaml(path: str):
    """Parse a reference config file -> (FilterConfig, CameraConfig, FrontendConfig)."""
    import cv2

    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    if not fs.isOpened():
        raise FileNotFoundError(path)

    T = fs.getNode("T_cam_imu").mat()
    if T is None:
        T = np.eye(4)
    R_b2c = T[:3, :3]
    # t of T_cam_imu maps imu->cam: p_c = R p_b + t, so camera position in
    # imu frame t_c_b = -R^T t (orcvio.cpp:233-238 inverts likewise)
    t_c_b = -R_b2c.T @ T[:3, 3]

    intr = fs.getNode("intrinsics")
    dist = fs.getNode("distortion_coeffs")

    def node_val(parent, name, default):
        n = parent.getNode(name)
        return float(n.real()) if not n.empty() else default

    cam = CameraConfig(
        width=_get(fs, "resolution_width", 752),
        height=_get(fs, "resolution_height", 480),
        fx=node_val(intr, "fx", 458.654),
        fy=node_val(intr, "fy", 457.296),
        cx=node_val(intr, "cx", 367.215),
        cy=node_val(intr, "cy", 248.375),
        distortion_model=_get(fs, "distortion_model", "radtan"),
        dist_coeffs=(
            node_val(dist, "k1", 0.0),
            node_val(dist, "k2", 0.0),
            node_val(dist, "p1", 0.0),
            node_val(dist, "p2", 0.0),
        ),
        R_b2c=tuple(map(tuple, R_b2c)),
        t_c_b=tuple(t_c_b),
    )

    fe = FrontendConfig(
        pyramid_levels=_get(fs, "pyramid_levels", 2),
        patch_size=_get(fs, "patch_size", 21),
        fast_threshold=_get(fs, "fast_threshold", 30),
        max_iteration=_get(fs, "max_iteration", 30),
        track_precision=_get(fs, "track_precision", 0.01),
        ransac_threshold=_get(fs, "ransac_threshold", 1.0),
        max_features_num=_get(fs, "max_features_num", 200),
        min_distance=_get(fs, "min_distance", 20),
        flag_equalize=_get(fs, "flag_equalize", True),
        pub_frequency=_get(fs, "pub_frequency", 10.0),
    )

    cfg = FilterConfig(
        sw_size=_get(fs, "sw_size", 20),
        max_features=fe.max_features_num,
        max_track_len=_get(fs, "max_track_len", 6),
        min_track_len=_get(fs, "least_observation_number", 3),
        use_larvio=_get(fs, "use_larvio_flag", False),
        use_left_perturbation=_get(fs, "use_left_perturbation_flag", True),
        use_closed_form_cov_prop=_get(fs, "use_closed_form_cov_prop_flag", False),
        if_fej=_get(fs, "if_FEJ", False),
        estimate_extrinsic=_get(fs, "estimate_extrin", False),
        estimate_td=_get(fs, "estimate_td", False),
        calib_imu=_get(fs, "calib_imu_instrinsic", False),
        prediction_only=_get(fs, "prediction_only_flag", False),
        if_zupt=_get(fs, "if_ZUPT_valid", False),
        gyro_noise=_get(fs, "noise_gyro", 0.004),
        acc_noise=_get(fs, "noise_acc", 0.08),
        gyro_bias_noise=_get(fs, "noise_gyro_bias", 2e-6),
        acc_bias_noise=_get(fs, "noise_acc_bias", 4e-5),
        observation_noise=_get(fs, "noise_feature", 0.035),
        init_cov_orientation=_get(fs, "initial_covariance_orientation", 4e-4),
        init_cov_velocity=_get(fs, "initial_covariance_velocity", 0.25),
        init_cov_position=_get(fs, "initial_covariance_position", 1.0),
        init_cov_gyro_bias=_get(fs, "initial_covariance_gyro_bias", 4e-4),
        init_cov_acc_bias=_get(fs, "initial_covariance_acc_bias", 0.01),
        init_cov_extrin_rot=_get(fs, "initial_covariance_extrin_rot", 3e-4),
        init_cov_extrin_trans=_get(fs, "initial_covariance_extrin_trans", 2.5e-5),
        td=_get(fs, "td", 0.0),
        zupt_max_feature_dis=_get(fs, "zupt_max_feature_dis", 2e-3),
        position_std_threshold=_get(fs, "position_std_threshold", 8.0),
        tri_translation_threshold=_get(fs, "feature_translation_threshold", 0.2),
        static_image_num=_get(fs, "static_image_num", 20),
        max_grid_features=_get(fs, "max_features_in_one_grid", 0),
        feature_idp_dim=_get(fs, "feature_idp_dim", 3),
        # EKF-SLAM capacity: the reference caps in-state features at
        # max_features_in_one_grid * aug_grid_rows * aug_grid_cols
        # (orcvio.cpp:2286); we bound the static capacity at 48 blocks
        ekf_feature_cap=min(
            _get(fs, "max_features_in_one_grid", 0)
            * _get(fs, "aug_grid_rows", 5)
            * _get(fs, "aug_grid_cols", 6),
            48,
        ),
    )
    fs.release()
    return cfg, cam, fe


def load_initial_state(path: str):
    """GT initial state from a reference YAML (initial_use_gt, orcvio.cpp:123).

    Returns None unless the file sets initial_use_gt; otherwise a dict with
    t, R (from initial_quat, Hamilton [x y z w]), v, p, bg, ba as numpy
    arrays, ready for FilterState.replace.
    """
    import cv2

    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    try:
        if not _get(fs, "initial_use_gt", False):
            return None
        import numpy as np

        from ..math import quat
        import jax.numpy as jnp

        def vec(key, n):
            node = fs.getNode(key)
            m = node.mat()
            return np.asarray(m, np.float64).reshape(-1)[:n]

        q = vec("initial_quat", 4)
        R = np.asarray(quat.to_rotation(jnp.asarray(q)))
        return dict(
            t=float(_get(fs, "initial_state_time", 0.0)),
            R=R,
            v=vec("initial_vel", 3),
            p=vec("initial_pos", 3),
            bg=vec("initial_bg", 3),
            ba=vec("initial_ba", 3),
        )
    finally:
        fs.release()
