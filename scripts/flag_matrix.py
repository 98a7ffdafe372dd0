"""Comparative flag-matrix parity: ours vs reference C++ across config flags.

The reference's headline evidence is config-comparative tables
(eval_results/orcvio_vs_larvio/orcvio_vs_larvio_euroc.md,
left_vs_right_perturb/orcvio_result.md). This produces the same artifact on
identical on-disk bytes: for every flag variant, ONE config.yaml is written
and BOTH systems consume it — propagation model (larvio RK4 vs OrcVIO
closed form), left vs right perturbation, ZUPT on/off, pure MSCKF vs hybrid
1d/3d-idp EKF features.

Run: python scripts/flag_matrix.py [--frames 900] [--workers 3]
Appends the matrix to PARITY.md (or writes PARITY_MATRIX.json).
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# flag overrides applied to write_reference_config's defaults
# (larvio RK4, right perturbation, ZUPT on, hybrid 1d-idp grid=1)
VARIANTS = {
    "base_larvio_hybrid1d": {},
    "orcvio_prop": dict(use_larvio_flag=0, use_left_perturbation_flag=1),
    "left_perturb": dict(use_left_perturbation_flag=1),
    "no_zupt": dict(if_ZUPT_valid=0),
    "pure_msckf": dict(max_features_in_one_grid=0),
    "hybrid_3d": dict(feature_idp_dim=3),
}

SEQS = ["S1_slow", "S2_nominal", "S3_fast", "S4_noisy"]


def run_cell(variant: str, seq: str, frames: int, backend: str = "cpu") -> dict:
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/orcvio_jax_cache")

    import bench
    from orcvio_tpu.dataio.euroc_writer import write_reference_config
    from orcvio_tpu.dataio.synthetic import SimConfig
    from scripts.parity_table import SEQS as SEQ_DEFS

    root = f"/tmp/orcvio_parity_{seq}"
    if not os.path.exists(os.path.join(root, f".complete_{frames}")):
        # generate in a subprocess: ensure_seq pins the CPU platform
        # process-wide, which would silently demote a TPU-backend run
        r = subprocess.run(
            [sys.executable, "-c",
             f"import sys; sys.path.insert(0, {REPO!r}); "
             f"from scripts.parity_table import ensure_seq; "
             f"ensure_seq({seq!r}, {SEQ_DEFS[seq]!r}, {frames})"],
            capture_output=True, text=True, timeout=1800, cwd=REPO)
        if r.returncode != 0:
            raise RuntimeError(f"seq gen failed: {r.stderr[-500:]}")
    cfg = os.path.join(root, f"config_{variant}.yaml")
    sim = SimConfig(n_frames=frames, frame_hz=20.0, imu_hz=200.0,
                    static_time=3.0, ramp_time=1.5, height=4.0,
                    **SEQ_DEFS[seq])
    write_reference_config(cfg, sim, output_dir="/tmp/refbench_cache/",
                           **VARIANTS[variant])
    traj = f"/tmp/refbench_traj_{seq}_{variant}.txt"
    ref = bench.measure_reference(root, cfg_path=cfg, traj_out=traj)
    ref_ate = bench.reference_ate(root, traj_path=traj)
    ours = bench.measure_ours(root, frames, cfg_path=cfg, batched=False,
                              reps=1)
    return dict(variant=variant, seq=seq, ate_ours=ours["ate_m"],
                ate_ref=ref_ate, fps_ref=ref.get("fps"),
                ref_note=ref.get("note", ""))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=900)
    ap.add_argument("--workers", type=int, default=3)
    ap.add_argument("--cell", nargs=2, metavar=("VARIANT", "SEQ"),
                    help="run one cell (internal)")
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"],
                    help="backend for OUR replay (the reference always runs "
                    "native on CPU); tpu reuses one compile per variant")
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY.md"))
    args = ap.parse_args()

    if args.cell:
        print(json.dumps(run_cell(args.cell[0], args.cell[1], args.frames,
                                  args.backend)))
        return

    if args.backend == "tpu":
        # sequential in-process: one compile per variant, reused across the
        # 4 sequences (the chip is a single shared resource anyway)
        results = {}
        os.makedirs("/tmp/flag_matrix", exist_ok=True)
        for v in VARIANTS:
            for s_ in SEQS:
                try:
                    results[(v, s_)] = run_cell(v, s_, args.frames, "tpu")
                except Exception as e:  # noqa: BLE001
                    results[(v, s_)] = dict(variant=v, seq=s_, error=str(e)[:300])
                print(f"done {v}/{s_}: {results[(v, s_)]}", flush=True)
        _write(results, args)
        return

    jobs = [(v, s) for v in VARIANTS for s in SEQS]
    results = {}
    running = []
    os.makedirs("/tmp/flag_matrix", exist_ok=True)
    i = 0
    import time
    while i < len(jobs) or running:
        while i < len(jobs) and len(running) < args.workers:
            v, s = jobs[i]
            f = open(f"/tmp/flag_matrix/{v}_{s}.json", "w")
            p = subprocess.Popen(
                [sys.executable, __file__, "--cell", v, s,
                 "--frames", str(args.frames)],
                stdout=f, stderr=subprocess.DEVNULL, cwd=REPO)
            running.append((v, s, p, f))
            i += 1
        for item in list(running):
            v, s, p, f = item
            if p.poll() is not None:
                running.remove(item)
                f.close()
                try:
                    results[(v, s)] = json.load(
                        open(f"/tmp/flag_matrix/{v}_{s}.json"))
                except Exception as e:  # noqa: BLE001
                    results[(v, s)] = dict(variant=v, seq=s, error=str(e))
                print(f"done {v}/{s}: {results[(v, s)]}", flush=True)
        time.sleep(3)

    _write(results, args)


def _write(results, args):
    json.dump({f"{v}|{s}": r for (v, s), r in results.items()},
              open("/tmp/flag_matrix/all.json", "w"), indent=1)

    lines = [
        "",
        "## Flag matrix (identical bytes, one config.yaml consumed by both "
        "systems)",
        "",
        f"{args.frames} frames/sequence; ATE (m) after pos-yaw alignment. "
        "Variants over the reference's algorithm flags "
        "(orcvio_vs_larvio_euroc.md / orcvio_result.md evidence style).",
        "",
        "| variant | " + " | ".join(
            f"{s} ours/ref" for s in SEQS) + " | avg ours | avg ref |",
        "|---|" + "---|" * (len(SEQS) + 2),
    ]
    for v in VARIANTS:
        cells = []
        ao = ar = n = 0.0
        for s in SEQS:
            r = results.get((v, s), {})
            if "ate_ours" in r and r["ate_ours"] == r["ate_ours"]:
                cells.append(f"{r['ate_ours']:.3f}/{r['ate_ref']:.3f}")
                ao += r["ate_ours"]
                ar += r["ate_ref"]
                n += 1
            else:
                cells.append("err")
        lines.append(f"| {v} | " + " | ".join(cells)
                     + f" | {ao / max(n, 1):.3f} | {ar / max(n, 1):.3f} |")
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended matrix to {args.out}")


if __name__ == "__main__":
    main()
