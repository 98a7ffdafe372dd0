"""Capture a device trace of a scan and print top ops by device time.

Run: python scripts/profile_scan.py [fb|frame|both]
"""
import glob
import gzip
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from orcvio_tpu.frontend import klt, tracker
from orcvio_tpu.frontend.image import build_pyramid
from orcvio_tpu.frontend.tracker import TrackerConfig, TrackerState

H, W, N, T = 480, 752, 200, 30
RNG = np.random.default_rng(0)
BASE = RNG.uniform(0, 255, (T + 1, H, W)).astype(np.float32)


def parse_xplane(logdir):
    """Sum device-track event durations by op name from the Chrome trace."""
    import json

    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print("no trace.json.gz found under", logdir)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # identify device-side process/thread ids (names mentioning TPU/XLA ops)
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    totals = defaultdict(float)
    counts = defaultdict(int)
    per_pid = defaultdict(float)
    for ev in events:
        if ev.get("ph") != "X":
            continue
        dur = ev.get("dur", 0)
        pname = pid_names.get(ev.get("pid"), "")
        per_pid[pname] += dur
        if "TPU" in pname or "tpu" in pname.lower() or "/device" in pname.lower():
            totals[ev.get("name", "?")] += dur
            counts[ev.get("name", "?")] += 1
    print("  -- total complete-event us by process --")
    for p, us in sorted(per_pid.items(), key=lambda kv: -kv[1])[:6]:
        print(f"  {us:12.1f} us   {p[:90]}")
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:30]
    tot = sum(totals.values())
    print(f"  == device ops: total {tot/1e3:.2f} ms ==")
    for name, us in top:
        print(f"  {us:10.1f} us  x{counts[name]:<6d} {name[:110]}")


def run_fb(logdir):
    xy0 = jnp.asarray(RNG.uniform(40, 400, (N, 2)), jnp.float32)

    def step(xy, pair):
        img0, img1 = pair
        p0 = tuple(build_pyramid(img0, 4))
        p1 = tuple(build_pyramid(img1, 4))
        out = klt.forward_backward_track(p0, p1, xy, xy).xy
        return jnp.clip(out, 40.0, 400.0), jnp.sum(out)

    f = jax.jit(lambda xy, ims: jax.lax.scan(step, xy, (ims[:-1], ims[1:])))
    a = jnp.asarray(BASE)
    jax.block_until_ready(f(xy0, a))
    with jax.profiler.trace(logdir):
        jax.block_until_ready(f(xy0, a + 0.01))


def run_frame(logdir):
    tc = TrackerConfig(height=H, width=W, pyramid_levels=4, capacity=N,
                       equalize=True, detect_every=2)
    ts0 = TrackerState.create(tc, jnp.float32)
    gyro = jnp.zeros((3,))
    Rbc = jnp.eye(3)
    times = jnp.arange(T, dtype=jnp.float32) * 0.05 + 0.05

    def pstep(ts, xs):
        img, t, idx = xs
        ts, out = tracker.process_frame(tc, ts, img, t, gyro, Rbc, frame_idx=idx)
        return ts, out.uvs

    f = jax.jit(lambda ts, ims, tms: jax.lax.scan(
        pstep, ts, (ims[:-1], tms, jnp.arange(T, dtype=jnp.int32))))
    a = jnp.asarray(BASE)
    jax.block_until_ready(f(ts0, a, times))
    with jax.profiler.trace(logdir):
        jax.block_until_ready(f(ts0, a + 0.01, times))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("fb", "both"):
        print("######## fb scan ########")
        run_fb("/tmp/prof_fb")
        parse_xplane("/tmp/prof_fb")
    if which in ("frame", "both"):
        print("######## process_frame scan ########")
        run_frame("/tmp/prof_frame")
        parse_xplane("/tmp/prof_frame")
