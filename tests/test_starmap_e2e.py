"""End-to-end StarMap path: raw rendered images -> CNN keypoints -> object
init -> LM, with NO injected detections.

Mirrors the reference's full object chain (starmap.cpp:606-696 keypoint
extraction -> ObjectInitNode.cpp:1037 triangulation + Kabsch + object LM),
driven by the shipped synthetic-car checkpoint
(orcvio_tpu/models/weights/starmap_car.*, scripts/train_starmap.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.dataio.render_object import CAR_KEYPOINTS, look_at, render_car
from orcvio_tpu.math import se3
from orcvio_tpu.models.starmap import detect_keypoints, load_pretrained
from orcvio_tpu.objects.lm import ObjectLMConfig
from orcvio_tpu.objects.manager import (
    ManagerConfig,
    ObjectTable,
    PoseHistory,
    finalize_object,
    ingest,
)

pytestmark = pytest.mark.slow  # >60 s e2e module; deselect with -m 'not slow'

SIZE = 96


@pytest.fixture(scope="module")
def net():
    return load_pretrained()


def camera_ring(T: int, dist: float = 6.5, elev: float = 0.35):
    """T camera poses on an arc around the car; returns (R_w2c, cam, K) lists."""
    views = []
    f = SIZE * dist / 6.0
    K = (f, f, SIZE / 2, SIZE / 2)
    for i in range(T):
        az = 0.6 + 1.2 * i / T  # ~70 degrees of arc
        cam = np.array([dist * np.cos(elev) * np.cos(az),
                        dist * np.cos(elev) * np.sin(az),
                        0.7 + dist * np.sin(elev)])
        views.append((look_at(cam, np.array([0.0, 0.0, 0.7])), cam, K))
    return views


class TestDetectorWrapper:
    def test_bbox_crop_to_normalized_keypoints(self, net):
        """StarMapKeypointDetector (starmap nodelet analogue): full image +
        pixel bbox -> normalized keypoints near the projected ground truth."""
        from orcvio_tpu.objects.detector import StarMapKeypointDetector

        rng = np.random.default_rng(9)
        H, W = 240, 320
        dist = 7.0
        f = 200.0
        K = (f, f, W / 2, H / 2)
        cam = np.array([dist * 0.9, dist * 0.3, 2.6])
        R_w2c = look_at(cam, np.array([0.0, 0.0, 0.7]))
        # render_car rasterizes a square canvas; crop to the W x H image
        r = render_car(R_w2c, cam, K, max(H, W), rng=rng)
        img = np.asarray(r.image)[:H, :W]
        vis = r.kp_visible & (r.kp_uv[:, 0] < W - 2) & (r.kp_uv[:, 1] < H - 2)
        assert vis.sum() >= 5
        uv = r.kp_uv[vis]
        bbox = np.array([uv[:, 0].min(), uv[:, 1].min(),
                         uv[:, 0].max(), uv[:, 1].max()])

        det = StarMapKeypointDetector(CAR_KEYPOINTS, K)
        kps, mask = det(img, bbox[None], np.asarray([True]))
        assert mask[0].sum() >= 5
        # compare in normalized coordinates
        gt_n = np.stack([(r.kp_uv[:, 0] - K[2]) / K[0],
                         (r.kp_uv[:, 1] - K[3]) / K[1]], axis=1)
        errs = []
        for k in range(12):
            if mask[0, k] and vis[k]:
                errs.append(np.linalg.norm(kps[0, k] - gt_n[k]))
        assert len(errs) >= 4
        # 8 px at f=200 -> 0.04 normalized
        assert np.median(errs) < 0.04, np.median(errs)


class TestObjectVioImageStep:
    def test_step_image_ingests_cnn_keypoints(self, net):
        """ObjectVio.step_image: raw image + pixel bboxes -> detector ->
        SORT -> keypoint ingestion (darknet->StarMap->ObjectInitNode chain)."""
        from orcvio_tpu.config.core import FilterConfig as FC
        from orcvio_tpu.filter.pipeline import FrameInput
        from orcvio_tpu.objects.detector import StarMapKeypointDetector
        from orcvio_tpu.objects.lm import ObjectLMConfig
        from orcvio_tpu.objects.manager import ManagerConfig
        from orcvio_tpu.objects.sort import SortConfig
        from orcvio_tpu.objects.vio_objects import ObjectVio, ObjectVioConfig

        rng = np.random.default_rng(11)
        H = W = 160
        f = 160.0
        K = (f, f, W / 2, H / 2)
        fcfg = FC(sw_size=4, max_features=8, max_track_len=3, imu_slab=4,
                  prediction_only=True, tri_translation_threshold=-1.0)
        ocfg = ObjectVioConfig(
            filter=fcfg, lm=ObjectLMConfig(iters=5),
            manager=ManagerConfig(capacity=2, window=8, n_kps=12,
                                  pose_history=16, min_frames=4,
                                  smooth_keypoints=False),
            sort=SortConfig(capacity=4, max_age=2, min_hits=1,
                            iou_threshold=0.1),
            kps_mean=tuple(map(tuple, CAR_KEYPOINTS)),
            shape_mean=(0.8, 2.0, 0.5),
            use_object_residual_update=False,
        )
        ov = ObjectVio(ocfg, max_obs=8, dtype=jnp.float64)
        detector = StarMapKeypointDetector(CAR_KEYPOINTS, K)

        cam = np.array([6.0, 2.0, 2.5])
        R_w2c = look_at(cam, np.array([0.0, 0.0, 0.7]))
        r = render_car(R_w2c, cam, K, H, rng=rng)
        vis = r.kp_visible
        uv = r.kp_uv[vis]
        bbox = np.array([uv[:, 0].min() - 2, uv[:, 1].min() - 2,
                         uv[:, 0].max() + 2, uv[:, 1].max() + 2])
        S = 4
        for k in range(3):
            frame = FrameInput(
                t=jnp.asarray(0.05 * (k + 1), jnp.float64),
                imu_t=jnp.zeros((S,), jnp.float64),
                imu_gyro=jnp.zeros((S, 3), jnp.float64),
                imu_acc=jnp.zeros((S, 3), jnp.float64),
                imu_mask=jnp.zeros((S,), bool),
                fids=-jnp.ones((8,), jnp.int32),
                uvs=jnp.zeros((8, 2), jnp.float64),
                uv_vels=jnp.zeros((8, 2), jnp.float64),
                meas_mask=jnp.zeros((8,), bool),
            )
            ov.step_image(frame, r.image * 255.0, bbox[None],
                          np.zeros(1, np.int32), np.asarray([True]), detector)
        live = np.asarray(ov.table.oid) >= 0
        assert live.sum() == 1
        row = int(np.argmax(live))
        assert int(ov.table.n[row]) >= 2
        # at least 4 of 12 keypoints present on ingested frames
        zs_mask = np.asarray(ov.table.zs_mask[row])
        assert zs_mask[: int(ov.table.n[row])].sum(axis=1).min() >= 4


class TestStarMapEndToEnd:
    def test_keypoint_detection_on_render(self, net):
        """Detected per-part keypoints land near the projected GT keypoints."""
        model, params, bs, meta = net
        rng = np.random.default_rng(5)
        (R_w2c, cam, K) = camera_ring(1)[0]
        r = render_car(R_w2c, cam, K, SIZE, rng=rng)
        crop = jnp.repeat(jnp.asarray(r.image)[..., None], 3, axis=-1)
        det = detect_keypoints(params, bs, model, crop,
                               jnp.asarray(CAR_KEYPOINTS, jnp.float32))
        found = np.asarray(det["found"])
        kp_xy = np.asarray(det["kp_xy"]) * 4.0  # heatmap -> crop pixels
        n_checked = n_good = 0
        for k in range(12):
            if not (found[k] and r.kp_visible[k]):
                continue
            n_checked += 1
            if np.hypot(*(kp_xy[k] - r.kp_uv[k])) <= 8.0:
                n_good += 1
        assert n_checked >= 5, f"too few co-detected keypoints: {n_checked}"
        assert n_good >= 0.7 * n_checked, (n_good, n_checked)

    def test_image_to_object_pose(self, net):
        """Full chain: renders -> CNN -> manager -> triangulation + Kabsch +
        LM recovers the object pose (GT = identity: object frame == world)."""
        model, params, bs, meta = net
        rng = np.random.default_rng(7)
        T, Kn = 12, 12
        views = camera_ring(T)
        canon = jnp.asarray(CAR_KEYPOINTS, jnp.float32)
        detect = jax.jit(lambda crop: detect_keypoints(params, bs, model, crop, canon))

        mc = ManagerConfig(capacity=2, window=T, n_kps=Kn, pose_history=32,
                           min_frames=6, smooth_keypoints=False)
        table = ObjectTable.create(mc, jnp.float64)
        poses = PoseHistory.create(mc.pose_history, jnp.float64)

        for i, (R_w2c, cam, K) in enumerate(views):
            r = render_car(R_w2c, cam, K, SIZE, rng=rng)
            crop = jnp.repeat(jnp.asarray(r.image)[..., None], 3, axis=-1)
            det = detect(crop)
            uv = np.asarray(det["kp_xy"]) * 4.0
            fx, fy, cx, cy = K
            zs = np.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], axis=1)
            mask = np.asarray(det["found"])
            # bbox from the detected keypoints (normalized coords)
            zb = np.array([zs[mask, 0].min(), zs[mask, 1].min(),
                           zs[mask, 0].max(), zs[mask, 1].max()])
            wTc = np.eye(4)
            wTc[:3, :3] = R_w2c.T
            wTc[:3, 3] = cam
            t = jnp.asarray(float(i), jnp.float64)
            poses = poses.push(jnp.asarray(wTc, jnp.float64), t)
            table = ingest(
                mc, table, t,
                jnp.asarray([1], jnp.int32), jnp.asarray([0], jnp.int32),
                jnp.asarray(zb, jnp.float64)[None],
                jnp.asarray(zs, jnp.float64)[None],
                jnp.asarray(mask)[None], jnp.ones(1, bool),
            )

        row = int(np.argmax(np.asarray(table.oid) == 1))
        assert int(table.n[row]) == T

        cfg = FilterConfig(tri_translation_threshold=-1.0)
        lmc = ObjectLMConfig(iters=25)
        shape = jnp.asarray([0.8, 2.0, 0.5], jnp.float64)  # car half-extents
        fin, exp, wTc_obj, data = finalize_object(
            cfg, lmc,
            table.zs[row], table.zs_mask[row], table.zb[row], table.zb_mask[row],
            table.t[row], jnp.arange(mc.window) < table.n[row],
            poses, jnp.asarray(CAR_KEYPOINTS, jnp.float64), shape,
        )
        assert bool(fin.ok)
        dr, dt = se3.displacement(fin.wTo, jnp.eye(4, dtype=jnp.float64))
        assert float(dt) < 0.5, f"object position error {float(dt):.3f} m"
        assert float(dr) < 0.25, f"object rotation error {float(dr):.3f} rad"
