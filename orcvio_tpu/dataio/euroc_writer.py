"""Write a synthetic sequence to disk in EuRoC MAV dataset format.

Real EuRoC data cannot be fetched in this environment, so accuracy/throughput
A/B runs against the reference C++ binary (native/refbench) use sequences
generated here: rendered 752x480 frames over a textured ground plane along an
analytic trajectory with autodiff-exact IMU, written in the exact on-disk
format the reference's DataReader parses (DataReader.hpp:31,67 — ns
timestamps, header line, CRLF, no trailing newline) plus EuRoC-style
groundtruth (dataset_reader.h:50 17-column format).

Both estimators then consume byte-identical inputs, which makes the measured
fps ratio and the ATE comparison directly interpretable.
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from .synthetic import SimConfig, imu_measurements, render_plane_view, smooth_texture, trajectory_pose
from ..math import quat as quat_ops


@dataclasses.dataclass(frozen=True)
class CameraModel:
    width: int = 752
    height: int = 480
    fx: float = 458.0
    fy: float = 458.0
    cx: float = 376.0
    cy: float = 240.0

    @property
    def K(self):
        return (self.fx, self.fy, self.cx, self.cy)


# camera looking straight down at the z=0 plane (body z up):
# cam x = body x, cam y = -body y, cam z = -body z
R_B2C_DOWN = np.asarray([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])


@dataclasses.dataclass(frozen=True)
class WriterConfig:
    cam: CameraModel = CameraModel()
    t_c_b: tuple = (0.03, 0.01, 0.0)  # camera position in body frame
    tex_size: int = 2048
    tex_scale: float = 0.012  # meters per texel (~24.6 m square world)
    tex_seed: int = 4
    image_noise: float = 1.5  # grayscale std added per frame
    gyro_bias: tuple = (0.002, -0.0015, 0.001)  # rad/s constant bias
    acc_bias: tuple = (0.02, -0.015, 0.025)  # m/s^2 constant bias
    t0_ns: int = 1_400_000_000_000_000_000  # EuRoC-era epoch base


def _fmt_rows(rows, header):
    """CRLF join with header, NO trailing newline (DataReader reads a bogus
    zero-timestamp row if the file ends with a newline)."""
    return "\r\n".join([header] + rows)


def write_euroc_dataset(out_dir: str, sim: SimConfig, wc: WriterConfig = WriterConfig(),
                        render_backend: str | None = None) -> dict:
    """Generate and write mav0/{cam0,imu0,state_groundtruth_estimate0}.

    Returns a dict with the ground-truth arrays and file paths.
    """
    import cv2

    mav = os.path.join(out_dir, "mav0")
    cam_dir = os.path.join(mav, "cam0", "data")
    imu_dir = os.path.join(mav, "imu0")
    gt_dir = os.path.join(mav, "state_groundtruth_estimate0")
    for d in (cam_dir, imu_dir, gt_dir):
        os.makedirs(d, exist_ok=True)

    dt_f = 1.0 / sim.frame_hz
    dt_i = 1.0 / sim.imu_hz
    n = sim.n_frames
    frame_ts = (np.arange(n) + 1) * dt_f
    imu_ts = dt_i * (1 + np.arange(int(round((n + 1) * dt_f * sim.imu_hz))))

    with jax.default_matmul_precision("highest"):
        pose_fn = jax.jit(jax.vmap(lambda t: trajectory_pose(sim, t)))
        vel_fn = jax.jit(jax.vmap(jax.jacobian(lambda t: trajectory_pose(sim, t)[1])))
        imu_fn = jax.jit(jax.vmap(lambda t: imu_measurements(sim, t)))

        gt_R, gt_p = pose_fn(jnp.asarray(frame_ts))
        gt_v = vel_fn(jnp.asarray(frame_ts))
        gyro, acc = imu_fn(jnp.asarray(imu_ts))
    gt_R, gt_p, gt_v = np.asarray(gt_R), np.asarray(gt_p), np.asarray(gt_v)
    gyro, acc = np.asarray(gyro), np.asarray(acc)

    rng = np.random.default_rng(sim.seed + 100)
    gyro = gyro + rng.normal(size=gyro.shape) * sim.gyro_noise + np.asarray(wc.gyro_bias)
    acc = acc + rng.normal(size=acc.shape) * sim.acc_noise + np.asarray(wc.acc_bias)

    # --- imu0/data.csv ---
    # int64 BEFORE adding the epoch: float64 loses ns precision at 1.4e18
    ns = wc.t0_ns + np.round(imu_ts * 1e9).astype(np.int64)
    rows = [
        f"{ns[i]},{gyro[i,0]:.9f},{gyro[i,1]:.9f},{gyro[i,2]:.9f},"
        f"{acc[i,0]:.9f},{acc[i,1]:.9f},{acc[i,2]:.9f}"
        for i in range(len(imu_ts))
    ]
    header = ("#timestamp [ns],w_RS_S_x [rad s^-1],w_RS_S_y [rad s^-1],w_RS_S_z [rad s^-1],"
              "a_RS_S_x [m s^-2],a_RS_S_y [m s^-2],a_RS_S_z [m s^-2]")
    with open(os.path.join(imu_dir, "data.csv"), "w", newline="") as f:
        f.write(_fmt_rows(rows, header))

    # --- cam0 frames ---
    tex = smooth_texture(wc.tex_size, wc.tex_size, seed=wc.tex_seed)
    R_b2c = jnp.asarray(R_B2C_DOWN)
    t_c_b = np.asarray(wc.t_c_b)
    K = wc.cam.K

    render = jax.jit(
        lambda Rc2w, tcw: render_plane_view(tex, wc.tex_scale, Rc2w, tcw, K,
                                            wc.cam.height, wc.cam.width)
    )
    frame_ns = wc.t0_ns + np.round(frame_ts * 1e9).astype(np.int64)
    img_rows = []
    for k in range(n):
        R_c2w = gt_R[k] @ np.asarray(R_b2c).T
        t_cw = gt_p[k] + gt_R[k] @ t_c_b
        img = np.asarray(render(jnp.asarray(R_c2w), jnp.asarray(t_cw)))
        img = img + rng.normal(size=img.shape) * wc.image_noise
        img = np.clip(img, 0, 255).astype(np.uint8)
        name = f"{frame_ns[k]}.png"
        cv2.imwrite(os.path.join(cam_dir, name), img)
        img_rows.append(f"{frame_ns[k]},{name}")
    with open(os.path.join(mav, "cam0", "data.csv"), "w", newline="") as f:
        f.write(_fmt_rows(img_rows, "#timestamp [ns],filename"))

    # --- groundtruth (EuRoC 17-column state format) ---
    q_xyzw = np.stack([np.asarray(quat_ops.from_rotation(jnp.asarray(R))) for R in gt_R])
    q_wxyz = q_xyzw[:, [3, 0, 1, 2]]  # EuRoC groundtruth stores w first
    gt_rows = []
    for k in range(n):
        p, q, v = gt_p[k], q_wxyz[k], gt_v[k]
        gt_rows.append(
            f"{frame_ns[k]},{p[0]:.9f},{p[1]:.9f},{p[2]:.9f},"
            f"{q[0]:.9f},{q[1]:.9f},{q[2]:.9f},{q[3]:.9f},"
            f"{v[0]:.9f},{v[1]:.9f},{v[2]:.9f},"
            f"{wc.gyro_bias[0]},{wc.gyro_bias[1]},{wc.gyro_bias[2]},"
            f"{wc.acc_bias[0]},{wc.acc_bias[1]},{wc.acc_bias[2]}"
        )
    gt_header = ("#timestamp,p_RS_R_x [m],p_RS_R_y [m],p_RS_R_z [m],"
                 "q_RS_w [],q_RS_x [],q_RS_y [],q_RS_z [],"
                 "v_RS_R_x [m s^-1],v_RS_R_y [m s^-1],v_RS_R_z [m s^-1],"
                 "b_w_RS_S_x [rad s^-1],b_w_RS_S_y [rad s^-1],b_w_RS_S_z [rad s^-1],"
                 "b_a_RS_S_x [m s^-2],b_a_RS_S_y [m s^-2],b_a_RS_S_z [m s^-2]")
    with open(os.path.join(gt_dir, "data.csv"), "w", newline="") as f:
        f.write(_fmt_rows(gt_rows, gt_header))

    return {
        "mav0": mav,
        "frame_ts": frame_ts,
        "frame_ns": frame_ns,
        "gt_R": gt_R,
        "gt_p": gt_p,
        "gt_v": gt_v,
    }


def write_reference_config(path: str, sim: SimConfig, wc: WriterConfig = WriterConfig(),
                           output_dir: str = "/tmp/refbench_cache/", **overrides) -> str:
    """Emit a config YAML in the reference's schema (config/euroc.yaml keys,
    orcvio.cpp:62-415 loadParameters) describing the synthetic camera: zero
    distortion, our intrinsics/extrinsics, EuRoC noise/filter settings.
    """
    os.makedirs(output_dir, exist_ok=True)
    cam = wc.cam
    # T_cam_imu: maps imu/body-frame points into the camera frame.
    R_ci = R_B2C_DOWN
    t_ci = -R_ci @ np.asarray(wc.t_c_b)
    T = np.eye(4)
    T[:3, :3] = R_ci
    T[:3, 3] = t_ci
    rows = ",\n     ".join(
        ", ".join(f"{T[i, j]:.15f}" for j in range(4)) for i in range(4)
    )
    params = dict(
        if_FEJ=0, estimate_extrin=0, estimate_td=0, calib_imu_instrinsic=0,
        pyramid_levels=2, patch_size=21, fast_threshold=30, max_iteration=30,
        track_precision=0.01, ransac_threshold=1, max_features_num=200,
        min_distance=20, flag_equalize=1, pub_frequency=10,
        sw_size=20,
        position_std_threshold=8.0, rotation_threshold=0.2618,
        translation_threshold=0.4, tracking_rate_threshold=0.5,
        least_observation_number=3, max_track_len=6,
        feature_translation_threshold=-1.0,
        noise_gyro=0.004, noise_acc=0.08, noise_gyro_bias=2e-6,
        noise_acc_bias=4e-5, noise_feature=0.008,
        initial_covariance_orientation=4e-4, initial_covariance_velocity=0.25,
        initial_covariance_position=1.0, initial_covariance_gyro_bias=4e-4,
        initial_covariance_acc_bias=0.01,
        initial_covariance_extrin_rot=3.0462e-8,
        initial_covariance_extrin_trans=9e-8,
        reset_fej_threshold=10.11,
        if_ZUPT_valid=1, if_use_feature_zupt_flag=1, zupt_max_feature_dis=2e-3,
        zupt_noise_v=1e-2, zupt_noise_p=1e-2, zupt_noise_q=3.4e-2,
        static_duration=1.0,
        imu_rate=200, img_rate=int(sim.frame_hz),
        max_features_in_one_grid=1, aug_grid_rows=5, aug_grid_cols=6,
        feature_idp_dim=1,
        use_schmidt=0, use_left_perturbation_flag=0,
        use_closed_form_cov_prop_flag=1, use_larvio_flag=1,
        chi_square_threshold_feat=0.95, feature_cost_threshold=4.7673e-04,
        init_final_dist_threshold=1e2, discard_large_update_flag=0,
        use_object_residual_update_cam_pose_flag=0, prediction_only_flag=0,
        initial_use_gt=0,
    )
    params.update(overrides)
    lines = ["%YAML:1.0", "", f'output_dir: "{output_dir}"', ""]
    for k, v in params.items():
        lines.append(f"{k}: {v}")
    lines += [
        "",
        'camera_model: "pinhole"',
        'distortion_model: "radtan"',
        f"resolution_width: {cam.width}",
        f"resolution_height: {cam.height}",
        "intrinsics:",
        f"   fx: {cam.fx}",
        f"   fy: {cam.fy}",
        f"   cx: {cam.cx}",
        f"   cy: {cam.cy}",
        "distortion_coeffs:",
        "   k1: 0.0",
        "   k2: 0.0",
        "   p1: 0.0",
        "   p2: 0.0",
        "T_cam_imu: !!opencv-matrix",
        "   rows: 4",
        "   cols: 4",
        "   dt: d",
        "   data:",
        f"    [{rows}]",
        "td: 0.0",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path
