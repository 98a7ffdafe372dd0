"""StarMap semantic-keypoint network: stacked hourglass in Flax + TPU post-processing.

TPU-native equivalent of the reference's StarMap stack
(``ros_wrapper/src/StarMap/python/models/hg.py`` — stacked hourglass with
intermediate supervision; ``src/starmap.cpp`` — TorchScript inference,
``parse_keypoints_from_heatmap`` peak extraction with heat threshold 0.3,
``cov_from_heatmap`` per-peak covariance, canonical-view-feature part
labeling). The network outputs 5 channels per stack: visibility heatmap (1),
canonical view feature xyz (3), and depth (1) (StarMap CVPR'18 representation).

Layout is NHWC (TPU-native); batch norm uses Flax linen with mutable
batch_stats. Default config matches the reference (nStack=2, nFeats=256,
4-level hourglass); tests exercise a tiny variant.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

HEAT_THRESH = 0.3  # starmap.cpp:622


class Residual(nn.Module):
    """Hourglass pre-activation bottleneck residual (layers/Residual.py)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        r = nn.BatchNorm(use_running_average=not train)(x)
        r = nn.relu(r)
        r = nn.Conv(f // 2, (1, 1))(r)
        r = nn.BatchNorm(use_running_average=not train)(r)
        r = nn.relu(r)
        r = nn.Conv(f // 2, (3, 3), padding="SAME")(r)
        r = nn.BatchNorm(use_running_average=not train)(r)
        r = nn.relu(r)
        r = nn.Conv(f, (1, 1))(r)
        skip = x if x.shape[-1] == f else nn.Conv(f, (1, 1))(x)
        return r + skip


class Hourglass(nn.Module):
    """Recursive hourglass (hg.py:8-60)."""

    depth: int
    features: int
    n_modules: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        up1 = x
        for _ in range(self.n_modules):
            up1 = Residual(self.features)(up1, train)
        low1 = nn.max_pool(x, (2, 2), strides=(2, 2))
        for _ in range(self.n_modules):
            low1 = Residual(self.features)(low1, train)
        if self.depth > 1:
            low2 = Hourglass(self.depth - 1, self.features, self.n_modules)(low1, train)
        else:
            low2 = low1
            for _ in range(self.n_modules):
                low2 = Residual(self.features)(low2, train)
        low3 = low2
        for _ in range(self.n_modules):
            low3 = Residual(self.features)(low3, train)
        up2 = jax.image.resize(low3, low3.shape[:1] + (low3.shape[1] * 2, low3.shape[2] * 2) + low3.shape[3:], "nearest")
        return up1 + up2


class StarMapNet(nn.Module):
    """Stacked hourglass with intermediate supervision (hg.py:62-120).

    Returns a list of (B, H/4, W/4, n_out) outputs, one per stack.
    n_out = 5: [heatmap, cvf_x, cvf_y, cvf_z, depth].
    """

    n_stack: int = 2
    n_feats: int = 256
    n_out: int = 5
    hg_depth: int = 4
    n_modules: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem: 7x7/2 -> residual -> pool -> residuals (hg.py:99-105)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = Residual(128)(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = Residual(128)(x, train)
        x = Residual(self.n_feats)(x, train)

        outs = []
        for i in range(self.n_stack):
            hg = Hourglass(self.hg_depth, self.n_feats, self.n_modules)(x, train)
            ll = hg
            for _ in range(self.n_modules):
                ll = Residual(self.n_feats)(ll, train)
            ll = nn.Conv(self.n_feats, (1, 1))(ll)
            ll = nn.BatchNorm(use_running_average=not train)(ll)
            ll = nn.relu(ll)
            tmp_out = nn.Conv(self.n_out, (1, 1))(ll)
            outs.append(tmp_out)
            if i < self.n_stack - 1:
                ll_ = nn.Conv(self.n_feats, (1, 1))(ll)
                tmp_out_ = nn.Conv(self.n_feats, (1, 1))(tmp_out)
                x = x + ll_ + tmp_out_
        return outs


# ---------------------------------------------------------------------------
# Post-processing (starmap.cpp equivalents, batched in jax)
# ---------------------------------------------------------------------------

def extract_peaks(heatmap, max_peaks: int, thresh: float = HEAT_THRESH):
    """Local maxima above threshold. Ref: parse_keypoints_from_heatmap (starmap.h:133).

    heatmap: (H, W). Returns (xy (P, 2) in heatmap pixels, score (P,),
    valid (P,)) with P = max_peaks, strongest first.
    """
    H, W = heatmap.shape
    m = jax.lax.reduce_window(heatmap, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    is_peak = (heatmap >= m) & (heatmap > thresh)
    score = jnp.where(is_peak, heatmap, -jnp.inf).reshape(-1)
    top, idx = jax.lax.top_k(score, max_peaks)
    yy = idx // W
    xx = idx % W
    valid = jnp.isfinite(top)
    xy = jnp.stack([xx, yy], axis=1).astype(jnp.float32)
    # subpixel refinement: weighted centroid of the local 5x5 patch (a cell
    # is 4 input pixels; the integer argmax alone carries a half-cell bias)
    o = jnp.arange(-2, 3)
    oyy, oxx = jnp.meshgrid(o, o, indexing="ij")
    offs = jnp.stack([oxx.reshape(-1), oyy.reshape(-1)], axis=1)  # (25, 2)

    def refine(p):
        px = jnp.clip(p[0].astype(jnp.int32) + offs[:, 0], 0, W - 1)
        py = jnp.clip(p[1].astype(jnp.int32) + offs[:, 1], 0, H - 1)
        w = jnp.maximum(heatmap[py, px] - thresh * 0.5, 0.0)
        wsum = jnp.maximum(jnp.sum(w), 1e-6)
        return p + jnp.sum(w[:, None] * offs, axis=0) / wsum

    xy = jax.vmap(refine)(xy)
    return xy, jnp.where(valid, top, 0.0), valid


def cov_from_heatmap(heatmap, xy, radius: int = 4):
    """Per-peak 2x2 covariance from the local heatmap patch. Ref: starmap.h:32.

    xy: (P, 2). Weighted second moments of the (2r+1)^2 patch around each peak.
    """
    H, W = heatmap.shape
    o = jnp.arange(-radius, radius + 1)
    oy, ox = jnp.meshgrid(o, o, indexing="ij")
    offs = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=1)  # (S, 2)

    def per_peak(p):
        pts = p[None, :] + offs
        px = jnp.clip(pts[:, 0].astype(jnp.int32), 0, W - 1)
        py = jnp.clip(pts[:, 1].astype(jnp.int32), 0, H - 1)
        w = jnp.maximum(heatmap[py, px], 0.0)
        wsum = jnp.maximum(jnp.sum(w), 1e-6)
        mean = jnp.sum(w[:, None] * offs, axis=0) / wsum
        d = offs - mean
        cov = jnp.einsum("s,si,sj->ij", w, d, d) / wsum
        return cov + 1e-3 * jnp.eye(2)

    return jax.vmap(per_peak)(xy)


def assign_parts(cvf, canonical_points):
    """Label peaks by nearest canonical-structure part. Ref: starmap.cpp:640-659.

    cvf: (P, 3) canonical view features; canonical_points: (K, 3) per class.
    Returns (part_id (P,), dist (P,)).
    """
    d = jnp.linalg.norm(cvf[:, None, :] - canonical_points[None, :, :], axis=-1)
    return jnp.argmin(d, axis=1), jnp.min(d, axis=1)


def merge_duplicate_parts(part_id, score, valid, n_parts: int):
    """Keep the highest-score peak per part label (starmap.cpp:652-659).

    Returns (best_peak_idx (K,), part_found (K,)).
    """
    P = part_id.shape[0]
    s = jnp.where(valid, score, -jnp.inf)
    best_score = jnp.full((n_parts,), -jnp.inf).at[jnp.where(valid, part_id, n_parts)].max(s, mode="drop")
    is_best = valid & (s == best_score[jnp.clip(part_id, 0, n_parts - 1)])
    # first peak achieving the max per part
    order = jnp.where(is_best, jnp.arange(P), P)
    best_idx = jnp.full((n_parts,), P, jnp.int32).at[jnp.where(is_best, part_id, n_parts)].min(
        order.astype(jnp.int32), mode="drop"
    )
    found = best_idx < P
    return jnp.clip(best_idx, 0, P - 1), found


def detect_keypoints(params, batch_stats, model: StarMapNet, crop, canonical_points, max_peaks=16):
    """Full inference for one bbox crop. Ref: starmap.cpp:606-696.

    crop: (Hc, Wc, 3) in [0, 1]. Returns dict with per-part keypoints
    (heatmap-pixel coords), scores, cvf, depth, covariances, found mask.
    """
    out = model.apply({"params": params, "batch_stats": batch_stats}, crop[None], train=False)
    pred = out[-1][0]  # (H/4, W/4, 5)
    heat = jax.nn.sigmoid(pred[..., 0])
    xy, score, valid = extract_peaks(heat, max_peaks)
    px = jnp.clip(xy[:, 0].astype(jnp.int32), 0, heat.shape[1] - 1)
    py = jnp.clip(xy[:, 1].astype(jnp.int32), 0, heat.shape[0] - 1)
    cvf = pred[py, px, 1:4]
    depth = pred[py, px, 4]
    part_id, _ = assign_parts(cvf, canonical_points)
    K = canonical_points.shape[0]
    best_idx, found = merge_duplicate_parts(part_id, score, valid, K)
    cov = cov_from_heatmap(heat, xy)
    return dict(
        kp_xy=xy[best_idx], kp_score=score[best_idx], kp_cov=cov[best_idx],
        kp_depth=depth[best_idx], found=found,
        # raw peaks, pre part-merge: callers can re-label them with joint
        # geometric assignment (objects/detector.py) instead of the
        # independent nearest-cvf labels above
        peaks_xy=xy, peaks_score=score, peaks_valid=valid, peaks_cvf=cvf,
    )


def load_pretrained(path: str | None = None):
    """Load the shipped synthetic-car checkpoint (scripts/train_starmap.py).

    Returns (model, params, batch_stats, meta). The reference ships a
    TorchScript Pascal3D+ model (starmap.cpp:665-692); this repo ships a
    small Flax checkpoint trained on the parametric-car renderer
    (dataio/render_object.py) so the image -> keypoints -> object path runs
    end-to-end with no external weights.
    """
    import json
    import os

    import flax.serialization

    if path is None:
        path = os.path.join(os.path.dirname(__file__), "weights", "starmap_car")
    with open(path + ".json") as f:
        meta = json.load(f)
    model = StarMapNet(**meta["model"])
    size = meta["input_size"]
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3), jnp.float32), train=False)
    with open(path + ".msgpack", "rb") as f:
        restored = flax.serialization.from_bytes(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, f.read())
    return model, restored["params"], restored["batch_stats"], meta


def heatmap_loss(outs: Sequence[jnp.ndarray], target):
    """Intermediate-supervision MSE over all stacks (StarMap training loss)."""
    loss = 0.0
    for o in outs:
        loss = loss + jnp.mean((o - target) ** 2)
    return loss / len(outs)
