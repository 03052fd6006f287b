"""Window watcher: poll the delivered-CPU canaries and fire interleaved
scaling trials only inside clean hypervisor windows.

The sandbox host's delivered CPU oscillates in multi-minute windows
(BASELINE.md "host window" notes): trials taken in a throttled window
measure the hypervisor, not the engine. This loop samples the single-thread
and 8-process aggregate canaries every POLL_S seconds; when both are under
the clean-window thresholds it immediately runs one interleaved trial pair
(hi cores, then lo cores — adjacent in time so both see the same window)
via scripts/scaling_trial.py, appending to the trials JSONL that
scripts/scaling_report.py assembles into BENCH_SCALING.json.

Usage: python scripts/window_watch.py [out.jsonl] [max_pairs] [n_rows] [k]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from concurrent.futures import ProcessPoolExecutor

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.trials_r2.jsonl"
MAX_PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N_ROWS = int(sys.argv[3]) if len(sys.argv) > 3 else 16_000_000
K = int(sys.argv[4]) if len(sys.argv) > 4 else 800_000

# round-1 clean windows measured 0.46-0.67 single / 0.52-0.73 agg8;
# gates are env-overridable for days when the host plateaus above them —
# a same-window pair at CONSTANT throttle still measures relative scaling
# (the per-trial canaries record the absolute window state)
import os

SINGLE_GATE = float(os.environ.get("WATCH_SINGLE_GATE", "0.70"))
AGG_GATE = float(os.environ.get("WATCH_AGG_GATE", "0.85"))
POLL_S = 120
LEVELS = (8, 2)  # N vs 4N cores, interleaved hi-first


def _burn(_):
    x = 0
    for i in range(10_000_000):
        x += i * i
    return x


def canary() -> float:
    """Single-thread CPU-speed probe (seconds; lower = faster window)."""
    t = time.time()
    _burn(0)
    return round(time.time() - t, 2)


def agg_canary(procs: int = 8) -> float:
    """Aggregate probe: wall seconds for `procs` concurrent burn loops —
    sees the hypervisor's total-CPU cap that a single thread cannot."""
    t = time.time()
    with ProcessPoolExecutor(procs) as ex:
        list(ex.map(_burn, range(procs)))
    return round(time.time() - t, 2)


def trial(cores: int) -> None:
    subprocess.run(
        [sys.executable, "/root/repo/scripts/scaling_trial.py",
         str(cores), str(N_ROWS), str(K), OUT],
        cwd="/root/repo", timeout=3600, check=False,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def main() -> None:
    pairs = 0
    while pairs < MAX_PAIRS:
        c1 = canary()
        c8 = agg_canary(8)
        clean = c1 <= SINGLE_GATE and c8 <= AGG_GATE
        print(json.dumps({"t": round(time.time()), "canary_s": c1,
                          "agg_canary_s": c8, "clean": clean,
                          "pairs_done": pairs}), flush=True)
        if clean:
            for cores in LEVELS:
                trial(cores)
            pairs += 1
        else:
            time.sleep(POLL_S)
    print("WATCH_DONE", flush=True)


if __name__ == "__main__":
    main()
