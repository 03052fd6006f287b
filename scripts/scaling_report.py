"""Assemble scaling-trial JSONL (scripts/scaling_trial.py) into
BENCH_SCALING.json: best-of per level + efficiency vs the ≥0.8 bar.

Usage: python scripts/scaling_report.py <trials.jsonl> <lo> <hi> [n_rows]

n_rows filters to one job size when the JSONL mixes sizes — best-of across
different n would compare different jobs.
"""

from __future__ import annotations

import json
import sys

PATH = sys.argv[1]
LO, HI = int(sys.argv[2]), int(sys.argv[3])
N_FILTER = int(sys.argv[4]) if len(sys.argv) > 4 else None

trials = {LO: [], HI: []}
with open(PATH) as f:
    for line in f:
        r = json.loads(line)
        if r.get("cores") in trials and (
                N_FILTER is None or r.get("n_frontier") == N_FILTER):
            trials[r["cores"]].append(r)

best = {c: max(rs, key=lambda r: r["urls_per_sec"]) for c, rs in trials.items()}
eff = (best[HI]["urls_per_sec"] / best[LO]["urls_per_sec"]) / (HI / LO)
n = best[LO]["n_frontier"]
k = best[LO]["k_global"]
out = {
    "job": f"wide-frontier scheduling rounds, n={n}, k={k}, 2 rounds, "
           f"best of {min(len(trials[LO]), len(trials[HI]))} interleaved "
           "trials per level (fresh JVM each; CPU canary per trial)",
    "levels": {f"local[{LO}]": best[LO], f"local[{HI}]": best[HI]},
    "all_trials": {f"local[{c}]": rs for c, rs in trials.items()},
    "scaling_efficiency": round(eff, 3),
    "bar": 0.8,
    "meets_bar": eff >= 0.8,
}
with open("/root/repo/BENCH_SCALING.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps({k: v for k, v in out.items() if k != "all_trials"}))
