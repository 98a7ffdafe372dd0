"""Collect flag-matrix cell results (/tmp/flag_matrix/*.json) into PARITY.md.

Split out of flag_matrix.py so a partially-complete or externally-scheduled
cell run (the cells are independent subprocesses) can still be collected
into the committed artifact. Cells missing or failed render as "err".

Run: python scripts/write_parity_matrix.py [--cells /tmp/flag_matrix]
"""
import argparse
import datetime
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.flag_matrix import SEQS, VARIANTS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", default="/tmp/flag_matrix")
    ap.add_argument("--frames", type=int, default=900)
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY.md"))
    args = ap.parse_args()

    results = {}
    for v in VARIANTS:
        for s in SEQS:
            p = os.path.join(args.cells, f"{v}_{s}.json")
            try:
                with open(p) as f:
                    results[(v, s)] = json.load(f)
            except Exception:  # noqa: BLE001
                results[(v, s)] = {}

    today = datetime.date.today().isoformat()
    lines = [
        "",
        "## Flag matrix (identical bytes, one config.yaml consumed by both "
        "systems)",
        "",
        f"Generated {today} by scripts/flag_matrix.py; {args.frames} "
        "frames/sequence; ATE (m) after pos-yaw alignment. Variants over "
        "the reference's algorithm flags (the "
        "orcvio_vs_larvio_euroc.md / orcvio_result.md evidence style). "
        "Reference fps columns are omitted here: cells ran under CPU "
        "contention (parallel workers); the dedicated throughput "
        "denominator lives in BENCH.",
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
