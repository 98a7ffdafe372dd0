"""Front-end tests: LK on known shifts, detection on rendered corners, ORB
invariances, RANSAC outlier rejection, distortion roundtrips, and the full
tracker on a rendered translating texture."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.frontend import orb
from orcvio_tpu.frontend.detect import detect_grid, shi_tomasi_score
from orcvio_tpu.frontend.image import bilinear_sample, build_pyramid
from orcvio_tpu.frontend.klt import forward_backward_track, pyr_track
from orcvio_tpu.frontend.ransac import ransac_fundamental, sampson_dist
from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState, process_frame
from orcvio_tpu.frontend.undistort import (
    distort_equidistant,
    distort_radtan,
    undistort_equidistant,
    undistort_radtan,
)

RNG = np.random.default_rng(3)


def smooth_texture(H, W, seed=0, octaves=4):
    """Band-limited random texture with plenty of gradient structure."""
    rng = np.random.default_rng(seed)
    img = np.zeros((H, W))
    for o in range(octaves):
        h, w = max(H >> (octaves - o), 2), max(W >> (octaves - o), 2)
        layer = rng.normal(size=(h, w))
        # bilinear upsample to full size
        yy = np.linspace(0, h - 1, H)
        xx = np.linspace(0, w - 1, W)
        layer = np.asarray(
            jax.image.resize(jnp.asarray(layer), (H, W), method="linear")
        )
        img += layer * (2.0**o)
    img = (img - img.min()) / (img.max() - img.min()) * 255.0
    return jnp.asarray(img, jnp.float32)


def shift_image(img, d):
    """img1(x) = img0(x - d) by bilinear sampling (true flow = +d)."""
    H, W = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=img.dtype), jnp.arange(W, dtype=img.dtype), indexing="ij")
    pts = jnp.stack([xx - d[0], yy - d[1]], axis=-1)
    return bilinear_sample(img, pts.reshape(-1, 2)).reshape(H, W)


class TestKLT:
    def test_recovers_known_shift(self):
        img0 = smooth_texture(120, 160, seed=1)
        for d in [(0.5, -0.3), (3.2, 2.7), (7.5, -5.25)]:
            img1 = shift_image(img0, jnp.asarray(d, jnp.float32))
            pyr0 = build_pyramid(img0, 3)
            pyr1 = build_pyramid(img1, 3)
            xy0 = jnp.asarray(RNG.uniform([20, 20], [140, 100], size=(30, 2)), jnp.float32)
            res = pyr_track(pyr0, pyr1, xy0, xy0, patch=15, iters=15)
            flow = np.asarray(res.xy - xy0)[np.asarray(res.ok)]
            assert len(flow) > 20
            assert np.allclose(flow.mean(0), d, atol=0.05), (d, flow.mean(0))

    def test_forward_backward_rejects_occluded(self):
        img0 = smooth_texture(120, 160, seed=2)
        img1 = shift_image(img0, jnp.asarray([2.0, 1.0], jnp.float32))
        # blank out a region in img1 (simulated occlusion)
        img1 = img1.at[40:80, 40:80].set(0.0)
        pyr0 = build_pyramid(img0, 3)
        pyr1 = build_pyramid(img1, 3)
        xy0 = jnp.asarray([[60.0, 60.0], [120.0, 30.0]], jnp.float32)
        res = forward_backward_track(pyr0, pyr1, xy0, xy0)
        assert bool(res.ok[1])
        assert not bool(res.ok[0])  # occluded


class TestDetect:
    def test_finds_square_corners(self):
        img = jnp.zeros((120, 160), jnp.float32)
        img = img.at[20:100, 30:130].set(200.0)  # rectangle spanning many cells
        xy, sc, ok = detect_grid(img, n_per_cell=2, grid_rows=4, grid_cols=4)
        pts = np.asarray(xy)[np.asarray(ok)]
        corners = np.array([[30, 20], [129, 20], [30, 99], [129, 99]])
        for c in corners:
            d = np.linalg.norm(pts - c, axis=1).min()
            assert d < 3.0, (c, d)

    def test_occupied_suppression(self):
        img = smooth_texture(120, 160, seed=4)
        occ = jnp.asarray([[80.0, 60.0]], jnp.float32)
        xy, sc, ok = detect_grid(
            img, 4, 4, 4, occupied_xy=occ, occupied_mask=jnp.ones(1, bool), min_distance=30.0
        )
        pts = np.asarray(xy)[np.asarray(ok)]
        assert (np.linalg.norm(pts - [80, 60], axis=1) >= 29.0).all()


class TestOrb:
    def test_same_patch_low_distance_diff_high(self):
        img = smooth_texture(200, 200, seed=5)
        xy = jnp.asarray([[60.0, 60.0], [140.0, 140.0]], jnp.float32)
        d = orb.describe(img, xy)
        # same point in a slightly shifted image
        img2 = shift_image(img, jnp.asarray([0.5, -0.5], jnp.float32))
        d2 = orb.describe(img2, xy + jnp.asarray([0.5, -0.5]))
        same = np.asarray(orb.hamming(d, d2))
        cross = int(orb.hamming(d[0:1], d[1:2])[0])
        assert same.max() < 45, same
        assert cross > 80, cross

    def test_rotation_invariance(self):
        # rotate image content about a keypoint; descriptor should survive
        img = smooth_texture(200, 200, seed=6)
        c = jnp.asarray([100.0, 100.0])
        ang = 0.4
        R = jnp.asarray([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]], jnp.float32)
        H, W = img.shape
        yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
        pts = jnp.stack([xx, yy], -1).reshape(-1, 2)
        src = (pts - c) @ R + c  # inverse rotation sampling
        img_rot = bilinear_sample(img, src).reshape(H, W)
        d1 = orb.describe(img, c[None, :])
        d2 = orb.describe(img_rot, c[None, :])
        dist = int(orb.hamming(d1, d2)[0])
        assert dist < 70, dist  # rotated view of same patch stays well under 128 (random)


class TestRansac:
    def test_rejects_planted_outliers(self):
        # two-view geometry: random points, known motion
        from orcvio_tpu.math import so3

        N = 80
        pts = RNG.uniform([-2, -2, 4], [2, 2, 8], size=(N, 3))
        R = np.asarray(so3.exp(jnp.asarray([0.02, -0.03, 0.01])))
        t = np.array([0.3, 0.1, 0.05])
        p1 = pts[:, :2] / pts[:, 2:3]
        pc2 = (pts - t) @ R  # world->cam2 with R as cam2 rotation transpose... keep simple rigid
        p2 = pc2[:, :2] / pc2[:, 2:3]
        p1 = jnp.asarray(p1, jnp.float32)
        p2 = jnp.asarray(p2, jnp.float32)
        # plant outliers
        out_idx = np.arange(0, N, 10)
        p2 = p2.at[out_idx].add(jnp.asarray(RNG.uniform(0.05, 0.2, size=(len(out_idx), 2)), jnp.float32))
        valid = jnp.ones(N, bool)
        inl, F = ransac_fundamental(p1, p2, valid, jax.random.PRNGKey(0), n_hyp=256, thresh=1e-6)
        inl = np.asarray(inl)
        assert not inl[out_idx].any(), "outliers survived"
        assert inl.sum() > N * 0.7, inl.sum()


class TestUndistort:
    def test_radtan_roundtrip(self):
        xy = jnp.asarray(RNG.uniform(-0.5, 0.5, size=(50, 2)), jnp.float64)
        k = (-0.28, 0.07, 0.0002, 1.8e-5)
        xyd = distort_radtan(xy, *k)
        xyu = undistort_radtan(xyd, *k)
        assert np.allclose(np.asarray(xyu), np.asarray(xy), atol=1e-6)

    def test_equidistant_roundtrip(self):
        xy = jnp.asarray(RNG.uniform(-0.6, 0.6, size=(50, 2)), jnp.float64)
        k = (-0.01, 0.02, -0.005, 0.001)
        xyd = distort_equidistant(xy, *k)
        xyu = undistort_equidistant(xyd, *k)
        assert np.allclose(np.asarray(xyu), np.asarray(xy), atol=1e-5)


class TestTracker:
    def test_tracks_translating_texture(self):
        H, W = 120, 160
        tc = TrackerConfig(
            height=H, width=W, pyramid_levels=3, capacity=60,
            grid_rows=4, grid_cols=5, per_cell=3, min_distance=10.0,
            K=(100.0, 100.0, W / 2, H / 2), dist_model="none", dist_coeffs=(),
            equalize=False,
        )
        ts = TrackerState.create(tc)
        big = smooth_texture(H + 60, W + 60, seed=7)
        R_b2c = jnp.eye(3)
        outs = []
        id_sets = []
        for k in range(6):
            dx = 4.0 * k
            img = big[20 : 20 + H, 20 + int(dx) : 20 + int(dx) + W]
            ts, out = process_frame(tc, ts, img, 0.05 * (k + 1), jnp.zeros(3), R_b2c)
            outs.append(out)
            id_sets.append(set(np.asarray(out.fids)[np.asarray(out.meas_mask)].tolist()))
        # persistent ids across frames
        common = id_sets[1] & id_sets[2] & id_sets[3] & id_sets[4]
        assert len(common) > 15, len(common)
        # flow direction: texture shifts left by 4 px/frame in image coords
        f3, f4 = outs[3], outs[4]
        ids3 = {int(i): j for j, i in enumerate(np.asarray(f3.fids)) if f3.meas_mask[j]}
        moved = []
        for j, i in enumerate(np.asarray(f4.fids)):
            if bool(f4.meas_mask[j]) and int(i) in ids3:
                du = float(f4.uvs[j, 0] - f3.uvs[ids3[int(i)], 0])
                moved.append(du * 100.0)  # back to pixels
        moved = np.asarray(moved)
        assert len(moved) > 10
        assert abs(np.median(moved) - (-4.0)) < 0.5, np.median(moved)

    def test_tracker_jits(self):
        H, W = 64, 96
        tc = TrackerConfig(height=H, width=W, pyramid_levels=2, capacity=20,
                           grid_rows=2, grid_cols=3, per_cell=2,
                           K=(50.0, 50.0, 48.0, 32.0), dist_model="none",
                           dist_coeffs=(), equalize=False)
        ts = TrackerState.create(tc)
        img = smooth_texture(H, W, seed=8)
        f = jax.jit(lambda s, i, t: process_frame(tc, s, i, t, jnp.zeros(3), jnp.eye(3)))
        ts2, out = f(ts, img, 0.05)
        ts3, out2 = f(ts2, img, 0.10)
        assert int(jnp.sum(out2.meas_mask)) > 5


class TestClahe:
    def test_improves_local_contrast_and_matches_cv2_roughly(self):
        import cv2

        from orcvio_tpu.frontend.image import clahe

        rng = np.random.default_rng(12)
        # low-contrast image with a bright region
        img = np.array(smooth_texture(160, 200, seed=12) * 0.25 + 60.0)
        img[40:80, 50:120] += 60
        out = np.asarray(clahe(jnp.asarray(img, jnp.float32)))
        assert out.min() >= 0 and out.max() <= 255.5
        # contrast expanded
        assert out.std() > 1.5 * img.std()
        # correlation with cv2's CLAHE
        ref = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(
            np.clip(img, 0, 255).astype(np.uint8)
        )
        corr = np.corrcoef(out.reshape(-1), ref.reshape(-1).astype(np.float64))[0, 1]
        assert corr > 0.95, corr
