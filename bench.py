"""Headline benchmark. Prints ONE JSON line.

Measures (a) the crawl-frontier engine's URLs scheduled+fetched per second on
the deterministic t2 synthetic graph (hot-host skew, 64 hosts) — the
BASELINE.json metric — and (b) wall-seconds for the headline analytics
queries from __spark_entry__.queries() at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), on local[$SPARK_GRAFT_CPUS].

Scaling evidence (N vs 4N cores on the same input) is produced by
scripts/scaling_bench.py, which runs THIS file at two parallelism levels.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _bench_tmp():
    """Round-state scratch on tmpfs — the sandbox disk is IOPS-throttled."""
    d = "/dev/shm/crawlspark-bench" if os.path.isdir("/dev/shm") else None
    if d:
        os.makedirs(d, exist_ok=True)
    return d
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline analytics queries (name -> forces full computation via count)
BENCH_QUERIES = [
    "pricing_summary", "order_revenue", "fetch_seq", "topk_per_host",
    "token_counts", "text_quality", "exact_dedup", "ngram_jaccard",
    "minhash_lsh", "simhash", "ann_topk", "ann_topk_lsh", "ann_topk_ivf",
    "docs_clean", "dup_components", "asof_join", "decontaminate",
    "images_clean", "images_preprocess", "caption_filter",
    "c4_clean", "warc_wet",
    # round-4 additions (no round-1 baseline counterpart — info rows)
    "gopher_quality", "bigram_logprob", "chunk_documents",
    # round-5 additions (info rows)
    "trigram_logprob", "psl_site_rollup", "docs_clean_full",
    "politeness_twin", "backoff_twin",
]

CRAWL_TIER = os.environ.get("SPARK_GRAFT_CRAWL_TIER", "t2")
CRAWL_ROUNDS = int(os.environ.get("SPARK_GRAFT_CRAWL_ROUNDS", "4"))
CRAWL_K = int(os.environ.get("SPARK_GRAFT_CRAWL_K", "2000"))
# the crawl engine's many small per-round actions lose ~25% to executor
# thread oversubscription at local[32] (measured 31.2 s at local[8] vs
# 40.4-45.7 s at local[32] in the same clean window — the same pattern the
# 8v32 wide pairs recorded in BENCH_SCALING.json): run the crawl section
# in its own JVM at the workload's best-known parallelism, reported in
# the output as crawl_e2e.cores
CRAWL_CORES = int(os.environ.get("SPARK_GRAFT_CRAWL_CPUS", "8"))

# the headline metric shape: one scheduling round over a WIDE frontier
# (BASELINE.json: "frontier URLs scheduled+fetched/sec on a 10^10-URL
# synthetic frontier", scaled down by the same pure-function generator)
WIDE_N = int(os.environ.get("SPARK_GRAFT_WIDE_N", "8000000"))
WIDE_K = int(os.environ.get("SPARK_GRAFT_WIDE_K", "400000"))


def _burn(_=None):
    x = 0
    for i in range(10_000_000):
        x += i * i
    return x


def _canary() -> float:
    t = time.time()
    _burn()
    return round(time.time() - t, 2)


def _agg_canary(procs: int = 8) -> float:
    import multiprocessing as mp
    t = time.time()
    with mp.Pool(procs) as p:
        p.map(_burn, range(procs))
    return round(time.time() - t, 2)


def bench_crawl(_spark) -> dict:
    """Run the e2e crawl bench in a fresh subprocess JVM at CRAWL_CORES
    (scripts/_crawl_probe.py — the exact same tier/k/rounds workload as
    always; best-of-2 with both trials recorded, same as in-process)."""
    import re
    import subprocess

    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "scripts", "_crawl_probe.py"), str(CRAWL_CORES)],
        capture_output=True, text=True, check=True).stdout
    trials = []
    for m in re.finditer(
            r"RESULT trial=\d+ cores=(\d+) seconds=([0-9.]+) "
            r"scheduled=(\d+) fetched=(\d+) rounds=(\d+)", out):
        cores, dt, scheduled, fetched, rounds = m.groups()
        dt = float(dt)
        trials.append({"seconds": round(dt, 2), "rounds": int(rounds),
                       "scheduled": int(scheduled), "fetched": int(fetched),
                       "cores": int(cores),
                       "urls_per_sec": round(
                           (int(scheduled) + int(fetched)) / dt, 1)})
    if not trials:
        raise RuntimeError(f"crawl probe produced no RESULT lines:\n{out}")
    best = min(trials, key=lambda t: t["seconds"])
    best["all_trials_s"] = [t["seconds"] for t in trials]
    return best


def main():
    from crawlspark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    # pre-warm the materialized pure-Python oracle files (memoized,
    # ~16 s cold): they are oracle-HARNESS work some q functions ensure
    # defensively — without the warm-up a cold /tmp would bill that
    # one-time cost to whichever timed query hits it first
    try:
        entry_mod._ensure_oracle_files()
    except Exception as e:
        # not fatal for benching, but never silent: the first timed
        # query that re-ensures would otherwise absorb the cost or fail
        # with the root cause hidden
        print(f"WARN: oracle pre-warm failed ({type(e).__name__}: {e}); "
              "first materialized-oracle query will pay / surface it",
              file=sys.stderr)
    timings = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 2)

    from crawlspark.benchlib import run_wide_round
    # best-of-2: the sandbox host's delivered CPU/bandwidth oscillates in
    # multi-minute windows (same job measured 27-255 s — BASELINE.md); two
    # trials make the recorded number far less window-dependent. The
    # canaries (below) record what the machine was delivering either way.
    trials = [run_wide_round(spark, WIDE_N, WIDE_K, CPUS,
                             tempfile.mkdtemp(prefix="bench_wide_",
                                              dir=_bench_tmp()))
              for _ in range(2)]
    wide = min(trials, key=lambda w: w["seconds"])
    wide["all_trials_s"] = [t["seconds"] for t in trials]
    timings["wide_frontier_round"] = wide["seconds"]

    # north-rule-COMPLETE wide round: the same job plus the per-round
    # payload-fidelity stage (decode png-exact / jpeg-PSNR, phash recheck,
    # caption equality over a deterministic 2% sample of fetched rows —
    # frontier/validate.py, one Arrow mapInPandas pass). Recorded
    # separately so the schedule-only number stays comparable to r1/r2.
    vtrials = [run_wide_round(spark, WIDE_N, WIDE_K, CPUS,
                              tempfile.mkdtemp(prefix="bench_widev_",
                                               dir=_bench_tmp()),
                              validate_fraction=0.02)
               for _ in range(2)]
    widev = min(vtrials, key=lambda w: w["seconds"])
    widev["all_trials_s"] = [t["seconds"] for t in vtrials]
    timings["wide_frontier_validated"] = widev["seconds"]

    crawl = bench_crawl(spark)
    timings["crawl_engine"] = crawl["seconds"]

    # delivered-CPU context for the run (same probes as
    # scripts/scaling_trial.py, inlined — that script parses argv at
    # import): single-thread ≈ cpu speed; the 8-proc aggregate exposes
    # hypervisor CPU caps a single thread cannot see
    host = {"canary_s": _canary(), "agg_canary_s": _agg_canary()}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "frontier URLs scheduled+fetched/sec "
                  f"(wide frontier n={WIDE_N}, k={WIDE_K}, local[{CPUS}])",
        "value": wide["urls_per_sec"],
        "unit": "urls/sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "wide_frontier": wide,
        "wide_frontier_validated": widev,
        "crawl_e2e": crawl,
        "host_window": host,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
