"""Tracing/profiling utilities.

TPU-native replacement for the reference's wall-clock instrumentation
(cv::getTickCount fps overlay, app/orcvioMain.cpp:131-182; clock() around the
object LM, ObjectFeatureInitializer.cpp:437): jax.profiler trace capture for
kernel-level timelines plus a lightweight stage timer with
``block_until_ready`` fences for per-stage wall-clock.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulate fenced wall-clock per named stage.

    >>> t = StageTimer()
    >>> with t.stage("frontend"):
    ...     out = track(...)   # fenced on exit
    >>> t.report()
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            if "out" in box:
                jax.block_until_ready(box["out"])
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            n = self.counts[name]
            tot = self.totals[name]
            lines.append(f"{name:20s} {tot:8.3f}s total  {tot / max(n, 1) * 1e3:8.2f} ms/call  x{n}")
        return "\n".join(lines)


class OnlineMetrics:
    """Incremental RMSE/NEES accumulation against groundtruth.

    Equivalent of the reference System's online accumulators
    (ros_wrapper/src/orcvio/src/System.cpp:389-392, 918-940 -> temp_rmse.txt).
    """

    def __init__(self):
        self.sq_pos = 0.0
        self.sq_rot = 0.0
        self.nees_pos = 0.0
        self.n = 0

    def update(self, p_est, R_est, p_gt, R_gt, P_pos=None):
        import numpy as np

        e = np.asarray(p_est) - np.asarray(p_gt)
        self.sq_pos += float(e @ e)
        Rrel = np.asarray(R_est).T @ np.asarray(R_gt)
        cos_t = np.clip((np.trace(Rrel) - 1) / 2, -1, 1)
        self.sq_rot += float(np.degrees(np.arccos(cos_t)) ** 2)
        if P_pos is not None:
            Pp = np.asarray(P_pos)
            self.nees_pos += float(e @ np.linalg.solve(Pp, e))
        self.n += 1

    def summary(self):
        import math

        n = max(self.n, 1)
        return {
            "rmse_pos_m": math.sqrt(self.sq_pos / n),
            "rmse_rot_deg": math.sqrt(self.sq_rot / n),
            "nees_pos": self.nees_pos / n,
            "n": self.n,
        }

    def write(self, path: str):
        s = self.summary()
        with open(path, "w") as f:
            f.write(f"{s['rmse_rot_deg']:.6f} {s['rmse_pos_m']:.6f} {s['nees_pos']:.6f} {s['n']}\n")
        return s
