"""Triage harness for the object-residual EKF update ATE regression.

Round-3 OBJECTS.md recorded VIO ATE 0.2705 m with the object update ON vs
0.0617 m OFF. This sweeps the suspect knobs one at a time on the same
synthetic world (eval/object_map_sim.py) and logs per-update diagnostics
(chi2 gamma vs threshold, rows, clone-position error before/after each
update vs GT) so the regression is attributed to a cause, not guessed.

Run one config:  python scripts/object_update_triage.py <name>
Run the matrix:  python scripts/object_update_triage.py   (forks subprocesses)
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = {
    "off":            dict(use_object_update=False),
    "on_default":     dict(),
    "on_sigma02":     dict(sigma_obj=0.02),
    "on_sigma05":     dict(sigma_obj=0.05),
    "on_nosmooth":    dict(smooth_keypoints=False),
    "on_notransport": dict(transport=False),
    "on_nosmooth_sigma02": dict(smooth_keypoints=False, sigma_obj=0.02),
    "on_sigma03": dict(sigma_obj=0.03),
    "on_sigma08": dict(sigma_obj=0.08),
    "on_sigma12": dict(sigma_obj=0.12),
}


def run_one(name):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/orcvio_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from orcvio_tpu.eval.object_map_sim import WorldConfig, run_object_mapping

    kw = dict(CONFIGS[name])
    kw.setdefault("use_object_update", True)
    res = run_object_mapping(WorldConfig(), collect_diag=True, **kw)
    out = dict(
        name=name,
        ate_m=res["ate_m"],
        mean_iou=res["mean_iou"],
        n_matched=res["n_matched"],
        n_est=res["n_est"],
        n_gt=res["n_gt"],
    )
    # summarize per-update harm
    dl = res.get("diag", [])
    used = [d for d in dl if d["used"]]
    out["n_updates_attempted"] = len(dl)
    out["n_updates_applied"] = len(used)
    out["n_harmful"] = sum(1 for d in used if d["err_after"] > d["err_before"])
    out["updates"] = dl
    print(json.dumps(out))
    return out


def main():
    if len(sys.argv) > 1:
        run_one(sys.argv[1])
        return
    os.makedirs("/tmp/obj_triage", exist_ok=True)
    procs = {}
    names = list(CONFIGS)
    running = []
    results = {}
    MAXP = 3
    i = 0
    while i < len(names) or running:
        while i < len(names) and len(running) < MAXP:
            n = names[i]
            f = open(f"/tmp/obj_triage/{n}.json", "w")
            p = subprocess.Popen(
                [sys.executable, __file__, n], stdout=f,
                stderr=subprocess.DEVNULL,
                env={**os.environ, "JAX_PLATFORMS": "cpu"})
            procs[p.pid] = (n, p, f)
            running.append(p)
            i += 1
        for p in list(running):
            if p.poll() is not None:
                running.remove(p)
                n, _, f = procs[p.pid]
                f.close()
                try:
                    results[n] = json.load(open(f"/tmp/obj_triage/{n}.json"))
                except Exception as e:
                    results[n] = dict(name=n, error=str(e), rc=p.returncode)
        import time
        time.sleep(2)
    hdr = f"{'config':<22}{'ATE m':>8}{'IoU':>7}{'est':>5}{'appl':>6}{'harm':>6}"
    print(hdr)
    for n in names:
        r = results.get(n, {})
        if "error" in r:
            print(f"{n:<22} ERROR {r}")
            continue
        print(f"{n:<22}{r.get('ate_m', float('nan')):>8.4f}"
              f"{r.get('mean_iou', float('nan')):>7.3f}{r.get('n_est', 0):>5}"
              f"{r.get('n_updates_applied', 0):>6}{r.get('n_harmful', 0):>6}")
    json.dump(results, open("/tmp/obj_triage/all.json", "w"), indent=1)
    print("full diagnostics -> /tmp/obj_triage/all.json")


if __name__ == "__main__":
    main()
