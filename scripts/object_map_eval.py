"""Object-map acceptance artifact: run the full object pipeline over a
multi-object synthetic world, persist the map, score mean 3D IoU with the
reference's Unity protocol, and write OBJECTS.md.

Two configurations:
  A. Injected analytic detections, 12 objects (the Unity-eval analogue:
     unity_object_iou_eval.py scores the mapping system given detections),
     with the object-residual EKF update on vs off for the VIO ATE delta.
  B. CNN-in-the-loop: rendered multi-car images -> StarMap keypoints ->
     same pipeline (3 objects; the detector itself under test).

Run: python scripts/object_map_eval.py [--quick]
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# float64 pipeline — must not land on the TPU backend (the env exports
# JAX_PLATFORMS=axon and re-exports it at jax import; config.update is the
# reliable pin, same as tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/orcvio_jax_cache")

import jax.numpy as jnp
import numpy as np


def run_config_a(quick: bool):
    from orcvio_tpu.eval.object_map_sim import WorldConfig, run_object_mapping

    wc = WorldConfig(n_objects=6 if quick else 12,
                     n_frames=150 if quick else 300)
    t0 = time.time()
    r_on = run_object_mapping(wc, use_object_update=True)
    r_off = run_object_mapping(wc, use_object_update=False)
    dt = time.time() - t0
    return wc, r_on, r_off, dt


def run_config_b(quick: bool):
    """CNN-in-the-loop: composite renders -> StarMap -> pipeline."""
    from orcvio_tpu.dataio.render_object import CAR_KEYPOINTS, render_car
    from orcvio_tpu.dataio.synthetic import SimConfig, generate, trajectory_pose
    from orcvio_tpu.config.core import FilterConfig
    from orcvio_tpu.eval.object_map_sim import (
        WorldConfig, analytic_detections, make_world)
    from orcvio_tpu.eval.objects import match_and_mean_iou, yaw_of_pose
    from orcvio_tpu.filter.state import FilterState
    from orcvio_tpu.math import se3
    from orcvio_tpu.objects.detector import StarMapKeypointDetector
    from orcvio_tpu.objects.lm import ObjectLMConfig
    from orcvio_tpu.objects.manager import ManagerConfig
    from orcvio_tpu.objects.sort import SortConfig
    from orcvio_tpu.objects.vio_objects import ObjectVio, ObjectVioConfig

    n_frames = 80 if quick else 140
    wc = WorldConfig(n_objects=3, n_frames=n_frames, ring_radius=6.5,
                     max_det=4, seed=11)
    objs = make_world(wc)
    H = W = 240
    f = 220.0
    K = (f, f, W / 2, H / 2)
    rng = np.random.default_rng(5)

    sim = SimConfig(n_frames=n_frames, n_landmarks=400, max_obs=50,
                    uv_noise=wc.uv_noise, seed=wc.seed, radius=3.0, omega=0.5)
    R_b2c = jnp.asarray([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]],
                        jnp.float64)
    t_c_b = jnp.asarray([0.05, 0.02, 0.0], jnp.float64)
    data = generate(sim, R_b2c=R_b2c, t_c_b=t_c_b)
    gt_R = np.asarray(data.gt_R)
    gt_p = np.asarray(data.gt_p)

    fcfg = FilterConfig(sw_size=10, max_features=80, max_track_len=6,
                        imu_slab=sim.imu_slab, observation_noise=0.004,
                        object_observation_noise=0.015,
                        tri_translation_threshold=-1.0)
    ocfg = ObjectVioConfig(
        filter=fcfg, lm=ObjectLMConfig(iters=25),
        manager=ManagerConfig(capacity=8, window=45, n_kps=12,
                              pose_history=256, min_frames=10,
                              smooth_keypoints=True),
        sort=SortConfig(capacity=8, max_age=3, min_hits=2, iou_threshold=0.1),
        kps_mean=tuple(map(tuple, CAR_KEYPOINTS)),
        shape_mean=(0.80, 2.00, 0.70),
        use_object_residual_update=True,
    )
    ov = ObjectVio(ocfg, max_obs=sim.max_obs, dtype=jnp.float64)
    detector = StarMapKeypointDetector(CAR_KEYPOINTS, K)

    from orcvio_tpu.dataio.synthetic import trajectory_pose as tp
    st = FilterState.create(fcfg, jnp.float64)
    R0, p0 = tp(sim, jnp.asarray(0.0))
    v0 = jax.jacobian(lambda t: tp(sim, t)[1])(jnp.asarray(0.0))
    imu = st.imu.replace(R=R0, p=p0, v=v0)
    d = np.asarray(fcfg.initial_cov_diag())
    d[:15] = 1e-6
    st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu, R_b2c=R_b2c,
                    t_c_b=t_c_b, P=jnp.asarray(np.diag(d)),
                    initialized=jnp.ones((), bool))
    ov.set_filter_state(st)

    def render_frame(wTc):
        """Composite all visible cars into one image; return img + px boxes."""
        cTw = np.asarray(se3.inverse_pose(jnp.asarray(wTc)))
        img = np.full((max(H, W), max(H, W)), 0.35, np.float32)
        boxes = []
        order = []
        for i, ob in enumerate(objs):
            pc = cTw[:3, :3] @ ob["t"] + cTw[:3, 3]
            if not (wc.min_depth < pc[2] < wc.max_depth):
                continue
            if abs(pc[0] / pc[2]) > 0.55 or abs(pc[1] / pc[2]) > 0.55:
                continue
            order.append((pc[2], i))
        for _, i in sorted(order, reverse=True):  # far -> near painter
            ob = objs[i]
            Ro, to = ob["wTo"][:3, :3], ob["wTo"][:3, 3]
            R_w2c_o = cTw[:3, :3] @ Ro
            cam_o = Ro.T @ (np.asarray(wTc)[:3, 3] - to)
            r = render_car(R_w2c_o, cam_o, K, max(H, W), background=img,
                           rng=rng)
            img = np.asarray(r.image)
            vis = r.kp_visible
            if vis.sum() >= 4:
                uv = r.kp_uv[vis]
                x0, y0 = uv[:, 0].min() - 3, uv[:, 1].min() - 3
                x1, y1 = uv[:, 0].max() + 3, uv[:, 1].max() + 3
                if x1 < W + 10 and y1 < H + 10:
                    boxes.append([x0, y0, min(x1, W - 1), min(y1, H - 1)])
        return img[:H, :W], np.asarray(boxes, np.float64).reshape(-1, 4)

    t0 = time.time()
    for k in range(n_frames):
        fr = jax.tree.map(lambda x: x[k], data.frames)
        Rc2w = gt_R[k] @ np.asarray(R_b2c).T
        tcw = gt_p[k] + gt_R[k] @ np.asarray(t_c_b)
        wTc = np.eye(4)
        wTc[:3, :3] = Rc2w
        wTc[:3, 3] = tcw
        img, boxes = render_frame(wTc)
        M = 4
        bx = np.zeros((M, 4))
        valid = np.zeros(M, bool)
        nb = min(len(boxes), M)
        bx[:nb] = boxes[:nb]
        valid[:nb] = True
        ov.step_image(fr, img * 255.0, bx, np.zeros(M, np.int32), valid,
                      detector)
    last = jax.tree.map(lambda x: x[n_frames - 1], data.frames)
    for _ in range(ocfg.sort.max_age + 2):
        ov.step_image(last, np.full((H, W), 90.0), np.zeros((4, 4)),
                      np.zeros(4, np.int32), np.zeros(4, bool), detector)
    dt = time.time() - t0

    est_list = [
        dict(t=np.asarray(o["wTo"])[:3, 3],
             yaw=yaw_of_pose(np.asarray(o["wTo"])),
             shape=(2 * o["shape"][2], 2 * o["shape"][1], 2 * o["shape"][0]))
        for o in ov.object_map.values()
    ]
    gt_list = [
        dict(t=o["t"], yaw=yaw_of_pose(o["wTo"]),
             shape=(2 * o["shape"][2], 2 * o["shape"][1], 2 * o["shape"][0]))
        for o in objs
    ]
    mean_iou, n_matched, pairs = match_and_mean_iou(est_list, gt_list)
    return dict(mean_iou=mean_iou, n_matched=n_matched, n_est=len(est_list),
                n_gt=len(gt_list), seconds=dt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="OBJECTS.md")
    args = ap.parse_args()

    from orcvio_tpu.objects.persistence import save_object_state

    wc, r_on, r_off, dt_a = run_config_a(args.quick)
    os.makedirs("/tmp/orcvio_object_map", exist_ok=True)
    for oid, o in r_on["object_map"].items():
        save_object_state("/tmp/orcvio_object_map/after_LM_object_state_%d.txt",
                          oid, "car", o["wTo"], o["kps_world"], o["shape"],
                          o["timestamps"])

    print(json.dumps(dict(
        config="A", mean_iou=round(r_on["mean_iou"], 4),
        n_matched=r_on["n_matched"], n_est=r_on["n_est"], n_gt=r_on["n_gt"],
        ate_objects_on=round(r_on["ate_m"], 4),
        ate_objects_off=round(r_off["ate_m"], 4))))

    b = run_config_b(args.quick)
    print(json.dumps(dict(config="B", **{k: (round(v, 4) if isinstance(v, float)
                                             else v) for k, v in b.items()})))

    pr_lines = ""
    if r_on["pr"]:
        pr_lines = "| pos<=m \\ rot<=deg | 30 | 45 | inf |\n|---|---|---|---|\n"
        for pl in (0.5, 1.0, 1.5):
            row = [f"{r_on['pr'][(pl, rl)]:.2f}"
                   for rl in (30.0, 45.0, float('inf'))]
            pr_lines += f"| {pl} | " + " | ".join(row) + " |\n"

    with open(args.out, "w") as f:
        f.write(f"""# Object-map evaluation (synthetic multi-object world)

Protocol: the reference's Unity evaluation — nearest-GT association, mean 3D
IoU (BEV rotated-rect x min height) over matches with IoU > 0.2
(`/root/reference/python_scripts/object_map_eval/unity_object_iou_eval.py:41-74`,
`utils.py:62-122`) — applied to the object map produced by the FULL pipeline
(VIO + SORT + per-keypoint KF ingest + triangulation/Kabsch init + object LM
+ object-residual EKF update), over a {wc.n_frames}-frame orbit of
{wc.n_objects} ground-truth cars. Regenerate: `python scripts/object_map_eval.py`.

## A. Injected analytic detections ({wc.n_objects} objects)

| metric | value |
|---|---|
| mean 3D IoU (matches > 0.2) | **{r_on['mean_iou']:.3f}** |
| objects matched / estimated / GT | {r_on['n_matched']} / {r_on['n_est']} / {r_on['n_gt']} |
| VIO ATE, object EKF update ON | {r_on['ate_m']:.4f} m |
| VIO ATE, object EKF update OFF | {r_off['ate_m']:.4f} m |

Per-pair IoU: {', '.join(f"{p[0]:.2f}" for p in r_on['pairs'])}

Precision table (fraction of matched pairs within thresholds,
`utils.py:330-416`):

{pr_lines}
Object map persisted in the reference's text format
(`ObjectState.h:40-46`) under `/tmp/orcvio_object_map/`.

## B. CNN-in-the-loop (rendered images -> StarMap keypoints)

Raw composite renders of {b['n_gt']} cars -> pixel bboxes -> StarMap
keypoint CNN (shipped checkpoint) -> same pipeline
(`ObjectVio.step_image`, the darknet->StarMap->ObjectInitNode chain):

| metric | value |
|---|---|
| mean 3D IoU | **{b['mean_iou']:.3f}** |
| objects matched / estimated / GT | {b['n_matched']} / {b['n_est']} / {b['n_gt']} |

Config A took {dt_a:.0f}s, config B {b['seconds']:.0f}s (CPU, float64).
""")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
