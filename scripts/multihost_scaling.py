"""Multi-host scaling demo + honest weak-scaling efficiency on one machine.

Launches N single-device worker processes, each pinned to its own CPU core
(taskset) and joined into one jax.distributed cluster over localhost — the
faithful small-scale model of "one chip per host over DCN", and the only
honest way to measure weak scaling on a shared-core machine (virtual CPU
devices contend for the same cores, so their "efficiency" measures core
oversubscription, not the program).

Usage: python scripts/multihost_scaling.py [--procs 2] [--frames 60]
Prints one JSON line: baseline fps, cluster fps, efficiency.
"""
import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_workers(n_procs: int, frames: int, cores_per: int, port: int = 47123):
    """Spawn n_procs pinned single-device workers; return proc-0 JSON.

    Every worker — in the baseline run and the cluster run alike — gets the
    same ``cores_per``-core slice, so efficiency compares equal compute.
    """
    procs = []
    taskset = shutil.which("taskset")
    for pid in range(n_procs):
        env = dict(os.environ)
        env.update(
            ORCVIO_COORDINATOR=f"localhost:{port}",
            ORCVIO_NUM_PROCESSES=str(n_procs),
            ORCVIO_PROCESS_ID=str(pid),
        )
        cmd = [sys.executable, "-m", "orcvio_tpu.eval.scaling",
               "--virtual", "1", "--frames", str(frames)]
        if taskset:
            lo = pid * cores_per
            cores = ",".join(str(lo + i) for i in range(cores_per))
            cmd = [taskset, "-c", cores] + cmd
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=env, text=True,
            stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
            stderr=subprocess.DEVNULL if pid else subprocess.PIPE,
        ))
    out, err = procs[0].communicate(timeout=600)
    for p in procs[1:]:
        p.wait(timeout=60)
    if procs[0].returncode != 0:
        raise RuntimeError(f"worker 0 failed: {err[-2000:]}")
    for line in reversed(out.strip().split("\n")):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from worker 0: {out[-500:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--cores-per-worker", type=int, default=0)
    args = ap.parse_args()

    cores_per = args.cores_per_worker or max(1, os.cpu_count() // args.procs)
    base = run_workers(1, args.frames, cores_per)
    cluster = run_workers(args.procs, args.frames, cores_per, port=47124)
    fps1 = base["weak_scaling"][0]["fps"]
    fpsN = cluster["weak_scaling"][0]["fps"]
    eff = round(fpsN / (args.procs * fps1), 3)
    print(json.dumps({
        "hosts": args.procs, "fps_1host": fps1, "fps_nhosts": fpsN,
        "scaling_efficiency": eff, "multihost": cluster["multihost"],
    }))


if __name__ == "__main__":
    main()
