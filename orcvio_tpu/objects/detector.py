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
                 dtype=jnp.float32):
        from ..models.starmap import detect_keypoints, load_pretrained

        model, params, bs, meta = load_pretrained(path)
        self.size = int(meta["input_size"])
        self.K_cam = K_cam
        self.dist_model = dist_model
        self.dist_coeffs = tuple(dist_coeffs)
        self.n_kps = int(np.asarray(canonical).shape[0])
        canon = jnp.asarray(canonical, dtype)
        size = self.size

        def infer(crop):
            return detect_keypoints(params, bs, model, crop, canon)

        self._infer = jax.jit(infer)

        def resize(patch):
            return jax.image.resize(patch, (size, size), "linear")

        self._resize = jax.jit(resize, static_argnums=())

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
        return kps, mask
