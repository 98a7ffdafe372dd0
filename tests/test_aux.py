"""Aux subsystem tests: checkpoint/resume, profiling, online metrics, batch eval."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orcvio_tpu.config.core import FilterConfig
from orcvio_tpu.eval.batch import batch_run_synthetic, markdown_table
from orcvio_tpu.filter.state import FilterState
from orcvio_tpu.utils.checkpoint import latest_step, restore_state, save_state
from orcvio_tpu.utils.profiling import OnlineMetrics, StageTimer


class TestCheckpoint:
    def test_roundtrip_filter_state(self, tmp_path):
        cfg = FilterConfig(sw_size=4, max_features=8)
        st = FilterState.create(cfg, jnp.float32)
        st = st.replace(t=jnp.asarray(3.5, jnp.float32), P=st.P + 0.123)
        path = str(tmp_path / "ckpt")
        save_state(path, st, step=7)
        assert latest_step(path) == 7
        st2 = restore_state(path, st, step=7)
        assert float(st2.t) == pytest.approx(3.5)
        assert np.allclose(np.asarray(st2.P), np.asarray(st.P))
        assert bool(jnp.all(st2.features.fid == st.features.fid))


class TestProfiling:
    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("a") as box:
            box["out"] = jnp.ones(10) * 2
        with t.stage("a") as box:
            box["out"] = jnp.ones(10) * 3
        rep = t.report()
        assert "a" in rep and "x2" in rep

    def test_online_metrics(self, tmp_path):
        m = OnlineMetrics()
        from orcvio_tpu.math import so3

        for k in range(5):
            m.update(
                np.asarray([k + 0.1, 0, 0]), np.asarray(so3.exp(jnp.asarray([0.01, 0, 0]))),
                np.asarray([float(k), 0, 0]), np.eye(3), P_pos=np.eye(3) * 0.01,
            )
        s = m.summary()
        assert s["rmse_pos_m"] == pytest.approx(0.1, abs=1e-6)
        assert s["rmse_rot_deg"] == pytest.approx(np.degrees(0.01), abs=1e-4)
        assert s["nees_pos"] == pytest.approx(1.0, abs=1e-6)
        out = m.write(str(tmp_path / "temp_rmse.txt"))
        assert os.path.exists(tmp_path / "temp_rmse.txt")


class TestBatchEval:
    @pytest.mark.slow
    def test_variants_table(self):
        variants = {
            "msckf": dict(),
            "larvio": dict(use_larvio=True),
        }
        base = dict(sw_size=8, max_features=60, max_track_len=4, imu_slab=12,
                    observation_noise=0.004, tri_translation_threshold=-1.0)
        res = batch_run_synthetic(
            variants, seeds=[3], base_cfg=base,
            sim_kw=dict(n_frames=60, n_landmarks=200, max_obs=40, imu_slab=12, uv_noise=0.002),
        )
        assert res["msckf"]["seq3"]["rmse_pos_m"] < 0.3
        assert res["larvio"]["seq3"]["rmse_pos_m"] < 0.3
        table = markdown_table(res)
        assert "| msckf |" in table and "seq3" in table
