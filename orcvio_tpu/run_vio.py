"""VIO runner: images + IMU -> tracker -> filter -> trajectory.

Equivalent of the reference's non-ROS application (``app/orcvioMain.cpp``):
the host loop feeds images to the jitted tracker step and its outputs to the
jitted filter/init step, writes a TUM trajectory, and (with groundtruth)
reports ATE. Usable as a CLI:

    python -m orcvio_tpu.run_vio --euroc /path/to/MH_01 --config config.yaml --out traj.txt
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config.core import FilterConfig
from .filter.pipeline import FrameInput, build_chi2_table
from .frontend.tracker import TrackerConfig, TrackerState, process_frame
from .vio import VioState, vio_step


def run_image_sequence(
    cfg: FilterConfig,
    tc: TrackerConfig,
    get_image: Callable[[int], np.ndarray],
    frame_ts: np.ndarray,
    imu_t: np.ndarray,
    imu_gyro: np.ndarray,
    imu_acc: np.ndarray,
    imu_mask: np.ndarray,
    R_b2c,
    t_c_b,
    init_filter_state=None,
    dtype=jnp.float32,
    progress_every: int = 0,
):
    """Host loop over frames. Returns dict with trajectory + timing stats.

    get_image(k) -> (H, W) float32 array. IMU arrays are pre-binned slabs
    (K, S, ...). If init_filter_state is given, static init is skipped.
    """
    K = len(frame_ts)
    R_b2c = jnp.asarray(R_b2c, dtype)
    t_c_b = jnp.asarray(t_c_b, dtype)

    ts = TrackerState.create(tc, dtype)
    vs = VioState.create(cfg, tc.capacity, dtype)
    vs = vs.replace(filter=vs.filter.replace(R_b2c=R_b2c, t_c_b=t_c_b))
    if init_filter_state is not None:
        vs = vs.replace(filter=init_filter_state.replace(R_b2c=R_b2c, t_c_b=t_c_b))
    chi2 = build_chi2_table(cfg, dtype)

    track_j = jax.jit(lambda s, img, t, g: process_frame(tc, s, img, t, g, R_b2c))
    vio_j = jax.jit(lambda s, fr: vio_step(cfg, s, fr, chi2))

    # FlexibleInitializer fallback (FlexibleInitializer.cpp:10-26): if static
    # init hasn't fired after dyn_window frames, try the dynamic initializer
    # on the recent window.
    from collections import deque

    dyn_window = 10
    recent = deque(maxlen=dyn_window)

    out_t, out_p, out_R = [], [], []
    n_upd = []
    t0 = time.perf_counter()
    for k in range(K):
        img = jnp.asarray(get_image(k), dtype)
        mask_k = imu_mask[k]
        g_mean = jnp.asarray(
            imu_gyro[k][mask_k].mean(axis=0) if mask_k.any() else np.zeros(3), dtype
        )
        ts, tout = track_j(ts, img, jnp.asarray(frame_ts[k], dtype), g_mean)
        frame = FrameInput(
            t=jnp.asarray(frame_ts[k], dtype),
            imu_t=jnp.asarray(imu_t[k], dtype),
            imu_gyro=jnp.asarray(imu_gyro[k], dtype),
            imu_acc=jnp.asarray(imu_acc[k], dtype),
            imu_mask=jnp.asarray(imu_mask[k]),
            fids=tout.fids,
            uvs=tout.uvs,
            uv_vels=tout.uv_vels,
            meas_mask=tout.meas_mask,
        )
        if not bool(vs.filter.initialized):
            recent.append(frame)
            if len(recent) == dyn_window and k % 5 == 0:
                from .init.dynamic import flexible_dynamic_attempt

                res = flexible_dynamic_attempt(
                    cfg, list(recent), R_b2c, t_c_b, jax.random.PRNGKey(k)
                )
                if res is not None and bool(res.ok):
                    imu0 = jax.tree.map(lambda x: x.astype(dtype), res.imu)
                    fs = vs.filter
                    vs = vs.replace(filter=fs.replace(
                        imu=imu0, imu_old=imu0, imu_fej_now=imu0, imu_fej_old=imu0,
                        t=jnp.asarray(frame_ts[k], dtype),
                        initialized=jnp.ones((), bool),
                    ))
                    print(f"[init] dynamic initialization at frame {k} (scale {float(res.scale):.3f})")
        vs, fout = vio_j(vs, frame)
        out_t.append(float(frame_ts[k]))
        out_p.append(np.asarray(fout.p))
        out_R.append(np.asarray(fout.R))
        n_upd.append(int(fout.n_update_features))
        if progress_every and (k + 1) % progress_every == 0:
            print(f"frame {k + 1}/{K} p={np.round(out_p[-1], 2)} upd={n_upd[-1]}")
    jax.block_until_ready(vs.filter.P)
    wall = time.perf_counter() - t0

    return {
        "t": np.asarray(out_t),
        "p": np.stack(out_p),
        "R": np.stack(out_R),
        "n_updates": np.asarray(n_upd),
        "fps": K / wall,
        "final_state": vs,
    }


def main(argv=None):
    import argparse

    from .config.yaml_io import load_reference_yaml
    from .dataio.euroc import bin_imu_per_frame, load_euroc, write_tum
    from .eval.trajectory import ate
    from .math import quat

    ap = argparse.ArgumentParser()
    ap.add_argument("--euroc", required=True, help="EuRoC sequence dir (contains mav0/)")
    ap.add_argument("--config", default="/root/reference/config/euroc.yaml")
    ap.add_argument("--out", default="traj_estimate.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--imu-slab", type=int, default=16)
    ap.add_argument("--staged", action="store_true",
                    help="stage the whole image stream on-device and compile "
                    "tracker+filter into one scan (the TPU fast path; "
                    "requires static init, no dynamic fallback)")
    ap.add_argument("--backend", default="",
                    help="pin a jax backend, e.g. cpu (the env default "
                    "otherwise)")
    args = ap.parse_args(argv)

    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    cfg, cam, fe = load_reference_yaml(args.config)
    cfg = FilterConfig(**{**cfg.__dict__, "imu_slab": args.imu_slab})

    # prefer the native threaded loader (native/euroc_loader.cpp)
    try:
        from .dataio.native import NativeEurocLoader

        nat = NativeEurocLoader(args.euroc)
        seq = type("Seq", (), dict(
            imu_t=nat.imu_t, gyro=nat.gyro, acc=nat.acc, cam_t=nat.cam_t,
            gt_t=nat.gt_t, gt_p=nat.gt_p, gt_q=nat.gt_q,
        ))()
        imu_t, gyro, acc, mask = nat.bin_imu(args.imu_slab, cfg.td)
        get_image = nat.get_image
    except Exception as e:  # fall back to the Python reader + cv2 decode
        print(f"native loader unavailable ({e}); using python reader")
        seq = load_euroc(args.euroc)
        imu_t, gyro, acc, mask = bin_imu_per_frame(seq, args.imu_slab, cfg.td)
        import cv2

        def get_image(k):
            img = cv2.imread(seq.image_paths[k], cv2.IMREAD_GRAYSCALE)
            return img.astype(np.float32)

    # Rebase times to the sequence start: absolute EuRoC epochs (~1.4e9 s)
    # have a 128 s ulp in float32 — every timestamp would round to the same
    # value on-chip. The filter only ever uses time differences.
    t_origin = float(seq.cam_t[0]) - 1.0
    seq_cam_t = seq.cam_t - t_origin
    imu_t = imu_t - t_origin * (imu_t != 0.0)  # padded slab entries stay 0
    gt_t_rel = None if seq.gt_t is None else seq.gt_t - t_origin

    K = len(seq.cam_t) if not args.max_frames else min(args.max_frames, len(seq.cam_t))

    frame_hz = 1.0 / max(float(np.median(np.diff(seq_cam_t[:min(K, 50)]))), 1e-3)
    tc = TrackerConfig(
        height=cam.height, width=cam.width,
        pyramid_levels=fe.pyramid_levels + 1,
        capacity=fe.max_features_num,
        min_distance=float(fe.min_distance),
        equalize=fe.flag_equalize,
        K=(cam.fx, cam.fy, cam.cx, cam.cy),
        dist_model=cam.distortion_model,
        dist_coeffs=tuple(cam.dist_coeffs),
        # re-detect at the reference's pub_frequency cadence
        detect_every=max(1, round(frame_hz / fe.pub_frequency)),
    )
    # GT initial state from the config (initial_use_gt, orcvio.cpp:123)
    init_fs = None
    from .config.yaml_io import load_initial_state

    gt0 = load_initial_state(args.config)
    if gt0 is not None:
        from .filter.state import FilterState

        st0 = FilterState.create(cfg, jnp.float32)
        imu0 = st0.imu.replace(
            R=jnp.asarray(gt0["R"], jnp.float32), v=jnp.asarray(gt0["v"], jnp.float32),
            p=jnp.asarray(gt0["p"], jnp.float32), bg=jnp.asarray(gt0["bg"], jnp.float32),
            ba=jnp.asarray(gt0["ba"], jnp.float32),
        )
        init_fs = st0.replace(
            t=jnp.asarray(gt0["t"], jnp.float32), imu=imu0, imu_fej_now=imu0,
            imu_old=imu0, R_b2c=jnp.asarray(cam.R_b2c, jnp.float32),
            t_c_b=jnp.asarray(cam.t_c_b, jnp.float32),
            initialized=jnp.ones((), bool),
        )
        print("initialized from GT state in config")

    if args.staged:
        from .eval.staged import make_e2e_replay, stage_sequence
        from .vio import VioState

        images = np.stack([np.asarray(get_image(k), np.uint8) for k in range(K)])
        staged = stage_sequence(images, seq_cam_t[:K], imu_t[:K], gyro[:K],
                                acc[:K], mask[:K], jnp.float32)
        staged = jax.device_put(staged)
        replay = jax.jit(make_e2e_replay(cfg, tc, np.asarray(cam.R_b2c),
                                         np.asarray(cam.t_c_b), jnp.float32))
        ts0 = TrackerState.create(tc, jnp.float32)
        vs0 = VioState.create(cfg, tc.capacity, jnp.float32)
        if init_fs is not None:
            vs0 = vs0.replace(filter=init_fs)
        t0 = time.perf_counter()
        (_, vs1), outs = replay(ts0, vs0, staged)
        jax.block_until_ready(outs["p"])
        res = {
            "t": np.asarray(staged.frame_ts), "p": np.asarray(outs["p"]),
            "R": np.asarray(outs["R"]),
            "n_updates": np.asarray(outs["n_upd"]),
            "fps": K / (time.perf_counter() - t0),
        }
    else:
        res = run_image_sequence(
            cfg, tc, get_image, seq_cam_t[:K],
            imu_t[:K], gyro[:K], acc[:K], mask[:K],
            np.asarray(cam.R_b2c), np.asarray(cam.t_c_b),
            init_filter_state=init_fs,
            progress_every=100,
        )
    q = np.stack([np.asarray(quat.from_rotation(jnp.asarray(R))) for R in res["R"]])
    write_tum(args.out, res["t"] + t_origin, res["p"], q)
    print(f"fps={res['fps']:.1f}, wrote {args.out}")
    if gt_t_rel is not None:
        try:
            m = ate(res["t"], res["p"], q, gt_t_rel, seq.gt_p, seq.gt_q, alignment="posyaw")
            print(f"ATE posyaw: {m['rmse_trans']:.3f} m, {m['rmse_rot_deg']:.2f} deg ({m['n_matched']} matched)")
        except ValueError as e:
            print(f"ATE skipped: {e}")


if __name__ == "__main__":
    main()
