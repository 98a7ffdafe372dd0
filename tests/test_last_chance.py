"""Pruning "last-chance" update (orcvio.cpp:2803-2851): observations dying
with pruned clones feed one extra MSCKF update instead of being dropped."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from dataclasses import replace

from orcvio_tpu.dataio.synthetic import SimConfig, generate
from orcvio_tpu.filter.pipeline import run_sequence

pytestmark = pytest.mark.slow  # >60 s e2e module; deselect with -m 'not slow'

CFG_KW = dict(sw_size=8, max_features=80, max_track_len=6, imu_slab=12,
              observation_noise=0.004, tri_translation_threshold=-1.0)
SIM_KW = dict(n_frames=60, n_landmarks=300, max_obs=40, imu_slab=12, seed=3)


def _run(flag: bool):
    cfg, st, frames, chi2 = ge._build({**CFG_KW, "prune_last_chance": flag},
                                      SIM_KW, jnp.float64)
    end, outs = jax.jit(lambda s, f: run_sequence(cfg, s, f, chi2))(st, frames)
    return cfg, st, end, outs


class TestLastChance:
    def test_fires_and_does_not_hurt(self):
        _, st, end_on, outs_on = _run(True)
        _, _, end_off, outs_off = _run(False)
        # it fired: trajectories differ once pruning begins
        d = np.linalg.norm(np.asarray(outs_on.p) - np.asarray(outs_off.p), axis=1)
        assert d[:6].max() == 0.0, "must not fire before the window fills"
        assert d.max() > 0.0, "last-chance update never fired"

        data = generate(SimConfig(**SIM_KW),
                        R_b2c=np.asarray(st.R_b2c, np.float64),
                        t_c_b=np.asarray(st.t_c_b, np.float64))
        gt = np.asarray(data.gt_p)
        rmse_on = np.sqrt(((np.asarray(outs_on.p) - gt) ** 2).sum(1).mean())
        rmse_off = np.sqrt(((np.asarray(outs_off.p) - gt) ** 2).sum(1).mean())
        # extra information must not degrade the estimate materially
        assert rmse_on <= 1.25 * rmse_off + 1e-3, (rmse_on, rmse_off)
        # covariance stays healthy (posterior after the extra update)
        w = np.linalg.eigvalsh(np.asarray(end_on.P))
        assert w.min() > -1e-10, w.min()
