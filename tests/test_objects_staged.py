"""Staged (in-scan) object pipeline vs the host orchestrator.

The compiled `lax.scan` replay (objects/staged.py) must reproduce the host
ObjectVio pipeline's behavior on the synthetic multi-object world: same VIO
trajectory quality, a merged map with one entry per seen car, centers near
GT. (The two are not bit-identical: the staged path drains at most one
finalization per frame.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.dataio.render_object import CAR_KEYPOINTS
from orcvio_tpu.dataio.synthetic import SimConfig, generate, trajectory_pose
from orcvio_tpu.eval.object_map_sim import WorldConfig, analytic_detections, make_world
from orcvio_tpu.objects.lm import ObjectLMConfig
from orcvio_tpu.objects.manager import ManagerConfig
from orcvio_tpu.objects.sort import SortConfig
from orcvio_tpu.objects.staged import MapTable, ObjectsStream, make_objects_replay, map_insert
from orcvio_tpu.objects.vio_objects import ObjectVioConfig
from orcvio_tpu.vio import VioState

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def staged_run():
    return _staged_run(finalize_budget=1)


def _staged_run(finalize_budget=1):
    dtype = jnp.float64
    wc = WorldConfig(n_frames=60)
    rng = np.random.default_rng(wc.seed + 1)
    objs = make_world(wc)
    sim = SimConfig(n_frames=wc.n_frames, n_landmarks=400, max_obs=50,
                    uv_noise=wc.uv_noise, seed=wc.seed, radius=3.0, omega=0.5)
    R_b2c = jnp.asarray([[0., -1, 0], [0, 0, -1], [1, 0, 0]], dtype)
    t_c_b = jnp.asarray([0.05, 0.02, 0.0], dtype)
    data = generate(sim, R_b2c=R_b2c, t_c_b=t_c_b)
    gt_R = np.asarray(data.gt_R)
    gt_p = np.asarray(data.gt_p)

    fcfg = FilterConfig(sw_size=10, max_features=80, max_track_len=6,
                        imu_slab=sim.imu_slab, observation_noise=0.004,
                        tri_translation_threshold=-1.0)
    ocfg = ObjectVioConfig(
        filter=fcfg, lm=ObjectLMConfig(iters=25),
        manager=ManagerConfig(capacity=wc.max_det + 4, window=45, n_kps=12,
                              pose_history=128, min_frames=12,
                              smooth_keypoints=True),
        sort=SortConfig(capacity=wc.max_det + 4, max_age=3, min_hits=2,
                        iou_threshold=0.1),
        kps_mean=tuple(map(tuple, CAR_KEYPOINTS)),
        shape_mean=(0.80, 2.00, 0.70),
        use_object_residual_update=True, merge_duplicates=True,
        finalize_budget=finalize_budget)

    T, M = wc.n_frames, wc.max_det
    bx = np.zeros((T, M, 4))
    cl = np.zeros((T, M), np.int32)
    kp = np.zeros((T, M, 12, 2))
    km = np.zeros((T, M, 12), bool)
    vl = np.zeros((T, M), bool)
    for k in range(T):
        Rc2w = gt_R[k] @ np.asarray(R_b2c).T
        tcw = gt_p[k] + gt_R[k] @ np.asarray(t_c_b)
        wTc = np.eye(4)
        wTc[:3, :3] = Rc2w
        wTc[:3, 3] = tcw
        bx[k], cl[k], kp[k], km[k], vl[k], _ = analytic_detections(
            wc, objs, wTc, rng)
    stream = ObjectsStream(boxes=jnp.asarray(bx, dtype),
                           classes=jnp.asarray(cl),
                           kps=jnp.asarray(kp, dtype),
                           kps_mask=jnp.asarray(km), valid=jnp.asarray(vl))

    vs = VioState.create(fcfg, sim.max_obs, dtype)
    st = vs.filter
    R0, p0 = trajectory_pose(sim, jnp.asarray(0.0))
    v0 = jax.jacobian(lambda t: trajectory_pose(sim, t)[1])(jnp.asarray(0.0))
    imu = st.imu.replace(R=R0.astype(dtype), p=p0.astype(dtype),
                         v=v0.astype(dtype))
    d = np.asarray(fcfg.initial_cov_diag())
    d[:15] = 1e-6
    st = st.replace(imu=imu, imu_fej_now=imu, imu_old=imu, R_b2c=R_b2c,
                    t_c_b=t_c_b, P=jnp.asarray(np.diag(d), dtype),
                    initialized=jnp.ones((), bool))
    vs = vs.replace(filter=st)

    replay = make_objects_replay(ocfg, sim.max_obs, map_capacity=24,
                                 dtype=dtype)
    frames = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype.kind == "f" else x, data.frames)
    carry, outs = jax.jit(replay)(replay.init_carry(vs), frames, stream)
    return wc, objs, carry, outs, gt_p


class TestStagedObjects:
    def test_vio_quality(self, staged_run):
        _, _, _, outs, gt_p = staged_run
        est_p = np.asarray(outs["p"])
        ate = float(np.sqrt(np.mean(np.sum((est_p - gt_p) ** 2, axis=1))))
        assert ate < 0.06, ate

    def test_map_entries(self, staged_run):
        wc, objs, carry, _, _ = staged_run
        mt = carry.omap
        nv = int(np.asarray(mt.valid).sum())
        assert 2 <= nv <= wc.n_objects, nv
        centers = np.asarray(mt.wTo[:, :3, 3])[np.asarray(mt.valid)]
        gtc = np.array([o["t"] for o in objs])
        for c in centers:
            assert float(np.min(np.linalg.norm(gtc - c, axis=1))) < 0.8

    def test_finalize_budget_2(self):
        """A 2-per-frame finalize budget must produce an equally valid map
        (deaths drain faster; same association/merge semantics)."""
        wc, objs, carry, outs, gt_p = _staged_run(finalize_budget=2)
        est_p = np.asarray(outs["p"])
        ate = float(np.sqrt(np.mean(np.sum((est_p - gt_p) ** 2, axis=1))))
        assert ate < 0.06, ate
        mt = carry.omap
        nv = int(np.asarray(mt.valid).sum())
        assert 2 <= nv <= wc.n_objects, nv
        centers = np.asarray(mt.wTo[:, :3, 3])[np.asarray(mt.valid)]
        gtc = np.array([o["t"] for o in objs])
        for c in centers:
            assert float(np.min(np.linalg.norm(gtc - c, axis=1))) < 0.8

    def test_map_insert_merges(self):
        mt = MapTable.create(4, 12, jnp.float64)
        wTo = jnp.eye(4, dtype=jnp.float64).at[:3, 3].set(
            jnp.asarray([1.0, 2.0, 0.0]))
        kw = jnp.zeros((12, 3), jnp.float64)
        mt = map_insert(mt, wTo, jnp.ones(3, jnp.float64), kw, 0, 10, 0.1,
                        jnp.asarray(True), 2.0)
        wTo2 = wTo.at[:3, 3].set(jnp.asarray([1.5, 2.0, 0.0]))
        mt = map_insert(mt, wTo2, jnp.ones(3, jnp.float64), kw, 0, 20, 0.1,
                        jnp.asarray(True), 2.0)
        assert int(mt.valid.sum()) == 1
        assert int(mt.n_tracks[0]) == 2
        np.testing.assert_allclose(np.asarray(mt.wTo[0, :3, 3]),
                                   [1.5, 2.0, 0.0])
        # far object -> new entry
        wTo3 = wTo.at[:3, 3].set(jnp.asarray([9.0, 2.0, 0.0]))
        mt = map_insert(mt, wTo3, jnp.ones(3, jnp.float64), kw, 0, 5, 0.1,
                        jnp.asarray(True), 2.0)
        assert int(mt.valid.sum()) == 2
