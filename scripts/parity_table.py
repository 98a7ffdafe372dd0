"""Accuracy parity table: this framework vs the unmodified reference C++.

Real EuRoC cannot be downloaded here (BASELINE.md notes the protocol), so
parity is demonstrated the strongest way available: both systems consume the
IDENTICAL on-disk EuRoC-format bytes of several deterministic synthetic
sequences spanning difficulty (slow/nominal/aggressive motion, low/high IMU
noise), and their ATE against the written ground truth is tabulated side by
side — the analogue of eval_results/orcvio_vs_larvio_euroc.md produced by
batch_run_euroc.py in the reference.

Usage: python scripts/parity_table.py [--frames 900] [--out PARITY.md]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SEQS = {
    # name: SimConfig overrides (difficulty ladder)
    "S1_slow": dict(radius=2.0, omega=0.3, seed=21,
                    gyro_noise=0.0024, acc_noise=0.028),
    "S2_nominal": dict(radius=2.5, omega=0.5, seed=11,
                       gyro_noise=0.0024, acc_noise=0.028),
    "S3_fast": dict(radius=3.0, omega=0.75, seed=31,
                    gyro_noise=0.0024, acc_noise=0.028),
    "S4_noisy": dict(radius=2.5, omega=0.5, seed=41,
                     gyro_noise=0.005, acc_noise=0.08),
}


def ensure_seq(name: str, kw: dict, n_frames: int) -> str:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from orcvio_tpu.dataio.euroc_writer import (
        write_euroc_dataset, write_reference_config)
    from orcvio_tpu.dataio.synthetic import SimConfig

    out = f"/tmp/orcvio_parity_{name}"
    marker = os.path.join(out, f".complete_{n_frames}")
    if not os.path.exists(marker):
        sim = SimConfig(n_frames=n_frames, frame_hz=20.0, imu_hz=200.0,
                        static_time=3.0, ramp_time=1.5, height=4.0, **kw)
        write_euroc_dataset(out, sim)
        write_reference_config(os.path.join(out, "config.yaml"), sim,
                               output_dir="/tmp/refbench_cache/")
        with open(marker, "w") as f:
            f.write("ok")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=900)
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY.md"))
    ap.add_argument("--backend", default="cpu", choices=["cpu", "default"],
                    help="cpu pins the CPU backend (accuracy identical "
                    "anywhere; fps-ours then reflects CPU — the TPU number "
                    "lives in bench.py)")
    args = ap.parse_args()

    if args.backend == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    # generate sequences in subprocesses (the writer pins the CPU backend;
    # the replay below should keep the default device)
    for name, kw in SEQS.items():
        r = subprocess.run(
            [sys.executable, "-c",
             f"import sys; sys.path.insert(0, {REPO!r}); "
             f"from scripts.parity_table import ensure_seq; "
             f"ensure_seq({name!r}, {kw!r}, {args.frames})"],
            capture_output=True, text=True, timeout=1800, cwd=REPO)
        if r.returncode != 0:
            raise RuntimeError(f"seq gen {name} failed: {r.stderr[-1000:]}")

    import bench

    rows = []
    for name in SEQS:
        root = f"/tmp/orcvio_parity_{name}"
        cfg = os.path.join(root, "config.yaml")
        traj = f"/tmp/refbench_traj_{name}.txt"
        ref = bench.measure_reference(root, cfg_path=cfg, traj_out=traj)
        ref_ate = bench.reference_ate(root, traj_path=traj)
        ours = bench.measure_ours(root, args.frames, cfg_path=cfg,
                                  batched=False, reps=1)
        rows.append({
            "seq": name, "ate_ours_m": ours["ate_m"], "ate_ref_m": ref_ate,
            "fps_ours": ours["e2e_fps"], "fps_ref": ref.get("fps"),
            "ref_note": ref.get("note", ""),
        })
        print(json.dumps(rows[-1]), flush=True)

    import datetime

    lines = [
        "# Accuracy parity: orcvio_tpu vs reference C++ (identical bytes)",
        "",
        f"Generated {datetime.date.today()} by scripts/parity_table.py — "
        f"{args.frames} frames/sequence ({args.frames / 20.0:.0f} s at 20 Hz), "
        "EuRoC on-disk format, both systems run on the same files with the "
        "same config.yaml. ATE = position RMSE after pos-yaw alignment vs "
        "written ground truth. fps-ours is backend-dependent (this table may "
        "be produced on CPU; the TPU throughput number lives in bench.py).",
        "",
        "| sequence | ATE ours (m) | ATE reference (m) | fps ours | fps ref |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['seq']} | {r['ate_ours_m']:.3f} | {r['ate_ref_m']:.3f} "
            f"| {r['fps_ours']:.1f} | {r['fps_ref']:.1f} |")
    ours_avg = sum(r["ate_ours_m"] for r in rows) / len(rows)
    ref_avg = sum(r["ate_ref_m"] for r in rows) / len(rows)
    lines += [
        "",
        f"Average ATE: ours {ours_avg:.3f} m, reference {ref_avg:.3f} m "
        f"(reference EuRoC-published bound: avg 0.23-0.24 m, BASELINE.md).",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
