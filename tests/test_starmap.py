"""StarMap hourglass tests: shapes, training convergence on synthetic
heatmaps, peak extraction / covariance / part merging post-processing."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from orcvio_tpu.models.starmap import (
    StarMapNet,
    assign_parts,
    cov_from_heatmap,
    detect_keypoints,
    extract_peaks,
    heatmap_loss,
    merge_duplicate_parts,
)


def tiny_model():
    return StarMapNet(n_stack=2, n_feats=16, n_out=5, hg_depth=2)


class TestNetwork:
    def test_shapes(self):
        m = tiny_model()
        x = jnp.zeros((2, 64, 64, 3))
        vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
        outs = m.apply(vars_, x, train=False)
        assert len(outs) == 2
        assert outs[0].shape == (2, 16, 16, 5)

    @pytest.mark.slow
    def test_training_reduces_loss(self):
        m = tiny_model()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32)
        # synthetic target: gaussian blob heatmap + random cvf/depth
        yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        tgt = np.zeros((4, 16, 16, 5), np.float32)
        for b in range(4):
            cx, cy = rng.integers(4, 12, 2)
            tgt[b, :, :, 0] = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / 4.0)
        tgt = jnp.asarray(tgt)
        vars_ = m.init(jax.random.PRNGKey(0), x, train=True)
        params = vars_["params"]
        bs = vars_["batch_stats"]
        opt = optax.adam(2e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, bs, opt_state):
            def loss_fn(p):
                outs, new_vars = m.apply(
                    {"params": p, "batch_stats": bs}, x, train=True, mutable=["batch_stats"]
                )
                return heatmap_loss(outs, tgt), new_vars["batch_stats"]

            (loss, bs2), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state2 = opt.update(g, opt_state)
            return optax.apply_updates(params, updates), bs2, opt_state2, loss

        losses = []
        for i in range(30):
            params, bs, opt_state, loss = step(params, bs, opt_state)
            losses.append(float(loss))
        assert losses[-1] < 0.3 * losses[0], (losses[0], losses[-1])


class TestPostProcessing:
    def test_extract_peaks(self):
        h = jnp.zeros((32, 32))
        h = h.at[10, 5].set(0.9).at[20, 25].set(0.7).at[3, 3].set(0.1)  # last below thresh
        xy, score, valid = extract_peaks(h, max_peaks=4)
        got = {(int(x), int(y)) for (x, y), v in zip(np.asarray(xy), np.asarray(valid)) if v}
        assert (5, 10) in got and (25, 20) in got
        assert int(valid.sum()) == 2

    def test_cov_from_heatmap(self):
        yy, xx = np.meshgrid(np.arange(33), np.arange(33), indexing="ij")
        sx, sy = 2.0, 1.0
        h = jnp.asarray(np.exp(-((xx - 16) ** 2 / (2 * sx**2) + (yy - 16) ** 2 / (2 * sy**2))))
        cov = cov_from_heatmap(h, jnp.asarray([[16.0, 16.0]]), radius=8)
        c = np.asarray(cov[0])
        assert c[0, 0] > c[1, 1]  # wider in x
        assert abs(c[0, 1]) < 0.2

    def test_assign_and_merge(self):
        canon = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        cvf = jnp.asarray([[0.9, 0.1, 0], [0.1, 0.8, 0.1], [0.95, 0, 0.05], [0, 0, 1.0]])
        pid, d = assign_parts(cvf, canon)
        assert pid.tolist() == [0, 1, 0, 2]
        score = jnp.asarray([0.5, 0.9, 0.8, 0.7])
        valid = jnp.ones(4, bool)
        best, found = merge_duplicate_parts(pid, score, valid, 3)
        assert found.tolist() == [True, True, True]
        assert int(best[0]) == 2  # higher-score duplicate wins part 0
        assert int(best[1]) == 1

    def test_detect_keypoints_end_to_end(self):
        m = tiny_model()
        x = jnp.zeros((64, 64, 3))
        vars_ = m.init(jax.random.PRNGKey(1), x[None], train=False)
        canon = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)), jnp.float32)
        out = detect_keypoints(vars_["params"], vars_["batch_stats"], m, x, canon)
        assert out["kp_xy"].shape == (5, 2)
        assert out["kp_cov"].shape == (5, 2, 2)
        assert out["found"].shape == (5,)
