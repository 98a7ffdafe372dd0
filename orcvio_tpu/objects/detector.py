"""StarMap keypoint detector: raw image + 2D bboxes -> semantic keypoints.

The in-process equivalent of the reference's StarMap nodelet
(starmap.cpp:606-696): per tracked bbox, crop + resize the image, run the
stacked-hourglass network, extract per-part peaks, and return keypoints in
NORMALIZED camera coordinates ready for ObjectVio.step / the object manager
(bbox detections themselves remain an external input, exactly as the
reference consumes darknet-YOLO boxes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend.undistort import undistort_pixels


class StarMapKeypointDetector:
    """Host-side wrapper holding the jitted per-crop inference.

    K_cam = (fx, fy, cx, cy); canonical (K, 3) per-class mean keypoints
    (config object_keypoints_mean). Crops are resized to the network input
    size; peak coordinates are mapped back through the crop transform and
    undistorted to normalized coordinates.
    """

    def __init__(self, canonical, K_cam, path: str | None = None,
                 dist_model: str = "radtan", dist_coeffs=(0.0, 0.0, 0.0, 0.0),
                 dtype=jnp.float32, geometric_labels: bool = True,
                 yaw_bins: int = 36):
        from ..models.starmap import detect_keypoints, load_pretrained

        model, params, bs, meta = load_pretrained(path)
        self.size = int(meta["input_size"])
        self.K_cam = K_cam
        self.dist_model = dist_model
        self.dist_coeffs = tuple(dist_coeffs)
        self.n_kps = int(np.asarray(canonical).shape[0])
        self.canonical_np = np.asarray(canonical, np.float64)
        self.geometric_labels = geometric_labels
        self.yaw_bins = yaw_bins
        self._proj_templates = (
            self._build_yaw_templates(yaw_bins) if geometric_labels else None)
        # per-box temporal memory: (bbox, winning template index) of the
        # previous frame, matched by IoU — the per-frame template match is
        # mirror-ambiguous with few peaks, while true yaw moves < 1 bin per
        # frame, so a temporal prior disambiguates (labels then stay
        # consistent along a track, which triangulation requires)
        self._prev_boxes: np.ndarray = np.zeros((0, 4))
        self._prev_tmpl: np.ndarray = np.zeros((0,), np.int64)
        canon = jnp.asarray(canonical, dtype)
        size = self.size

        def infer(crop):
            return detect_keypoints(params, bs, model, crop, canon)

        self._infer = jax.jit(infer)

        def resize(patch):
            return jax.image.resize(patch, (size, size), "linear")

        self._resize = jax.jit(resize, static_argnums=())

    def _build_yaw_templates(self, yaw_bins: int, elevations=(0.1, 0.35),
                             dist_factor: float = 3.0):
        """Bbox-normalized 2D projections of the canonical keypoints over a
        (yaw x elevation) view grid.

        The cvf identity head of a small hourglass cannot disambiguate the
        left/right-symmetric car keypoints (measured: own-label error
        55-160 px where best-label is 5-25 px — identity, not localization,
        breaks the CNN-in-the-loop path). Label assignment by JOINT geometry
        is robust: project the canonical structure at each candidate view,
        normalize to its 2D bounding box, and match detected peaks (also
        bbox-normalized) by nearest-neighbor; the best-scoring view's
        matching gives the labels, with the cvf distance only breaking the
        mirror-symmetry ties. Returns (V, K, 2) templates in [0, 1]^2.
        """
        from ..dataio.render_object import look_at, render_car

        kps = self.canonical_np
        d = dist_factor * float(np.max(np.linalg.norm(kps, axis=1)))
        S = 96
        f = S * d / 6.0
        Kc = (f, f, S / 2, S / 2)
        rng = np.random.default_rng(0)
        temps, vises, yaws = [], [], []
        ctr = kps.mean(axis=0)
        for el in elevations:
            for yi, g in enumerate(np.linspace(0, 2 * np.pi, yaw_bins,
                                               endpoint=False)):
                cam = ctr + np.array([d * np.cos(el) * np.cos(g),
                                      d * np.cos(el) * np.sin(g),
                                      d * np.sin(el)])
                R_w2c = look_at(cam, ctr)
                r = render_car(R_w2c, cam, Kc, S, rng=rng)
                vis = r.kp_visible
                if vis.sum() < 3:
                    continue
                uv = r.kp_uv.astype(np.float64)
                lo = uv[vis].min(axis=0)
                span = np.maximum(uv[vis].max(axis=0) - lo, 1e-6)
                temps.append((uv - lo) / span)
                vises.append(vis)
                yaws.append(yi)
        # (V, K, 2), (V, K), (V,) yaw-bin index of each template
        return np.asarray(temps), np.asarray(vises), np.asarray(yaws)

    def _assign_geometric(self, peaks_xy, peaks_valid, peaks_cvf, peaks_score,
                          bbox_hm, prior_tmpl: int = -1):
        """Joint label assignment: best (yaw, elevation) template by greedy
        2D matching in bbox-normalized coordinates; cvf breaks ties.

        peaks_xy: (P, 2) heatmap coords; bbox_hm: (4,) the DETECTION bbox in
        heatmap coords — both peaks and templates normalize to the full-car
        extent (normalizing peaks by their own bbox breaks down when the CNN
        detects only a subset of the visible keypoints).
        Returns (best_idx (K,), found (K,)) or None.
        """
        K = self.n_kps
        P = peaks_xy.shape[0]
        # absolute + relative score gate: real keypoints cluster near the max
        # peak score while hallucinated peaks trail far below it
        smax = float(np.max(np.where(peaks_valid, peaks_score, 0.0)))
        v = peaks_valid & (peaks_score > max(0.45, 0.55 * smax))
        if v.sum() < 3:
            # too few peaks for joint geometry: keep cvf-nearest labels
            return None
        lo = np.asarray(bbox_hm[:2])
        span = np.maximum(np.asarray(bbox_hm[2:]) - lo, 1e-6)
        pn = (peaks_xy - lo) / span  # (P, 2)
        cvf_d = np.linalg.norm(
            peaks_cvf[:, None, :] - self.canonical_np[None, :, :], axis=-1)
        cvf_cost = 0.12 * cvf_d / max(1.0, np.max(np.linalg.norm(
            self.canonical_np, axis=1)))
        best = (None, np.inf, -1)
        templates, t_vis, t_yaw = self._proj_templates
        nb = self.yaw_bins
        if prior_tmpl >= 0:
            dy = np.abs(t_yaw - t_yaw[prior_tmpl])
            yaw_pen = 0.012 * np.minimum(dy, nb - dy).astype(np.float64)
        else:
            yaw_pen = np.zeros(len(templates))
        for ti, (tmpl, tv) in enumerate(zip(templates, t_vis)):
            d2 = np.linalg.norm(pn[:, None, :] - tmpl[None, :, :], axis=-1)
            cost = d2 + cvf_cost
            cost[~v] = np.inf
            cost[:, ~tv] = np.inf  # occluded at this view: unmatched
            # greedy one-to-one matching, cheapest pair first
            c = cost.copy()
            assign = np.full(K, -1, np.int64)
            total, matched = 0.0, 0
            for _ in range(min(int(v.sum()), K)):
                i = np.argmin(c)
                pi, ki = divmod(i, K)
                if not np.isfinite(c[pi, ki]) or d2[pi, ki] > 0.35:
                    break
                assign[ki] = pi
                total += cost[pi, ki]
                matched += 1
                c[pi, :] = np.inf
                c[:, ki] = np.inf
            if matched < 3:
                continue
            score = total / matched - 0.08 * matched + yaw_pen[ti]
            if score < best[1]:
                best = (assign, score, ti)
        if best[0] is None:
            return None
        assign = best[0]
        found = assign >= 0
        return np.where(found, assign, 0), found, best[2]

    def __call__(self, img: np.ndarray, boxes_px: np.ndarray, valid):
        """img (H, W) float [0,255] or [0,1]; boxes_px (M, 4) pixel bboxes.

        Returns (kps_norm (M, K, 2), kps_mask (M, K)) in normalized
        (undistorted) camera coordinates.
        """
        img = np.asarray(img, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        H, W = img.shape
        M = len(boxes_px)
        kps = np.zeros((M, self.n_kps, 2), np.float32)
        mask = np.zeros((M, self.n_kps), bool)
        fx, fy, cx, cy = self.K_cam
        new_boxes: list = []
        new_tmpl: list = []
        for m in range(M):
            if not bool(valid[m]):
                continue
            x0, y0, x1, y1 = boxes_px[m]
            # square crop with margin around the bbox center: preserves the
            # aspect ratio the network was trained on (square renders with
            # the object spanning ~half the crop)
            cx_b = 0.5 * (x0 + x1)
            cy_b = 0.5 * (y0 + y1)
            half = 0.75 * max(x1 - x0, y1 - y0)
            x0i = int(np.clip(cx_b - half, 0, W - 2))
            x1i = int(np.clip(cx_b + half, x0i + 2, W))
            y0i = int(np.clip(cy_b - half, 0, H - 2))
            y1i = int(np.clip(cy_b + half, y0i + 2, H))
            patch = jnp.asarray(img[y0i:y1i, x0i:x1i])
            crop = self._resize(patch)
            crop3 = jnp.repeat(crop[..., None], 3, axis=-1)
            det = self._infer(crop3)
            found = np.asarray(det["found"])
            uv_heat = np.asarray(det["kp_xy"])  # heatmap pixels (size/4 grid)
            if self.geometric_labels:
                sx_ = (x1i - x0i) / self.size
                sy_ = (y1i - y0i) / self.size
                bbox_hm = np.array([(x0 - x0i) / sx_ / 4.0,
                                    (y0 - y0i) / sy_ / 4.0,
                                    (x1 - x0i) / sx_ / 4.0,
                                    (y1 - y0i) / sy_ / 4.0])
                prior = -1
                if len(self._prev_boxes):
                    iou = _bbox_iou_np(np.asarray([x0, y0, x1, y1], np.float64),
                                       self._prev_boxes)
                    j = int(np.argmax(iou))
                    if iou[j] > 0.3:
                        prior = int(self._prev_tmpl[j])
                res = self._assign_geometric(
                    np.asarray(det["peaks_xy"], np.float64),
                    np.asarray(det["peaks_valid"]),
                    np.asarray(det["peaks_cvf"], np.float64),
                    np.asarray(det["peaks_score"], np.float64), bbox_hm,
                    prior_tmpl=prior)
                if res is not None:
                    assign, found, tmpl_i = res
                    uv_heat = np.asarray(det["peaks_xy"], np.float64)[assign]
                    new_boxes.append([x0, y0, x1, y1])
                    new_tmpl.append(tmpl_i)
            # heatmap -> crop -> image pixels
            sx = (x1i - x0i) / self.size
            sy = (y1i - y0i) / self.size
            uv_img = np.stack([uv_heat[:, 0] * 4.0 * sx + x0i,
                               uv_heat[:, 1] * 4.0 * sy + y0i], axis=1)
            uvn = np.asarray(undistort_pixels(
                jnp.asarray(uv_img, jnp.float32), self.K_cam,
                self.dist_model, self.dist_coeffs))
            kps[m] = uvn
            mask[m] = found
        self._prev_boxes = np.asarray(new_boxes, np.float64).reshape(-1, 4)
        self._prev_tmpl = np.asarray(new_tmpl, np.int64)
        return kps, mask


def _bbox_iou_np(box, boxes):
    """IoU of one box (4,) vs (N, 4), xmin ymin xmax ymax."""
    ix0 = np.maximum(box[0], boxes[:, 0])
    iy0 = np.maximum(box[1], boxes[:, 1])
    ix1 = np.minimum(box[2], boxes[:, 2])
    iy1 = np.minimum(box[3], boxes[:, 3])
    inter = np.maximum(ix1 - ix0, 0) * np.maximum(iy1 - iy0, 0)
    a = np.maximum(box[2] - box[0], 0) * np.maximum(box[3] - box[1], 0)
    b = np.maximum(boxes[:, 2] - boxes[:, 0], 0) * np.maximum(
        boxes[:, 3] - boxes[:, 1], 0)
    return inter / np.maximum(a + b - inter, 1e-9)
