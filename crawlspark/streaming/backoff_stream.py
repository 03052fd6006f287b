"""Streaming host backoff — the engine's error circuit breaker
(CrawlConfig.backoff_errors / backoff_window, frontier/engine.py) as
stateful Structured Streaming, with the SAME windowed arithmetic so a
crawl can move between batch rounds and a streaming admission gate
without changing which hosts are suppressed:

    suppressed(host, r) = sum of the host's non-2xx counts over rounds
                          [r - backoff_window, r - 1]  >=  backoff_errors

One applyInPandasWithState group per host: state = the trailing window's
(round, n_err) pairs as two parallel arrays (bounded at backoff_window
entries — O(1) per host, like the batch engine's windowed aggregate over
the host_errors append table). Micro-batch rows are that host's fetch
results; rounds inside a batch are processed in ascending order, so the
decision for round r uses exactly the errors of committed rounds < r —
the batch engine's contract. Rows arriving for an ALREADY-DECIDED round
(late data within the same batch) fold into that round's count before
the next round is decided; across batches, rounds are assumed
non-decreasing per host (the crawl's natural order — same assumption as
the politeness stream's micro-batch scheduling).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("host string, round int, n_fetched long, n_err long, "
              "suppressed boolean")
STATE_SCHEMA = "rounds array<int>, errs array<long>"


def streaming_backoff(fetches: DataFrame, backoff_errors: int,
                      backoff_window: int = 2) -> DataFrame:
    """fetches: streaming DataFrame with columns (host, round, status).
    Returns one row per (host, round) in the batch: the round's fetch and
    non-2xx counts plus whether the host was suppressed ENTERING that
    round under the batch engine's trailing-window rule."""

    def gate(key, pdf_iter, state: GroupState):
        host = key[0]
        if state.exists:
            rounds, errs = list(state.get[0]), list(state.get[1])
        else:
            rounds, errs = [], []
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        out = []
        for r, grp in sorted(rows.groupby("round"), key=lambda t: t[0]):
            r = int(r)
            window = sum(e for rr, e in zip(rounds, errs)
                         if r - backoff_window <= rr <= r - 1)
            n_err = int((grp["status"] // 100 != 2).sum())
            out.append({"host": host, "round": r,
                        "n_fetched": int(len(grp)), "n_err": n_err,
                        "suppressed": window >= backoff_errors})
            if rounds and rounds[-1] == r:     # late rows, same round
                errs[-1] += n_err
            else:
                rounds.append(r)
                errs.append(n_err)
            # prune: only the trailing window can ever matter again
            while rounds and rounds[0] < r - backoff_window + 1:
                rounds.pop(0)
                errs.pop(0)
        state.update((rounds, errs))
        yield pd.DataFrame(out, columns=["host", "round", "n_fetched",
                                         "n_err", "suppressed"])

    return (fetches
            .groupBy("host")
            .applyInPandasWithState(
                gate, OUT_SCHEMA, STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def batch_backoff(fetches: DataFrame, backoff_errors: int,
                  backoff_window: int = 2) -> DataFrame:
    """BATCH TWIN of :func:`streaming_backoff`: the identical
    trailing-window suppression rule as one declarative plan — a
    per-(host, round) count aggregate plus a RANGE window summing the
    prior ``backoff_window`` rounds' errors. Value-checkable against a
    plain SQL window mirror (the stream's bounded state arrays exist
    only to make the same sum incremental)."""
    from pyspark.sql import Window, functions as F

    # NULL status counts as an ERROR, matching the stream's pandas
    # arithmetic (NaN // 100 != 2 → True): the when() tests the 2xx
    # branch so NULL falls to the error side, not silently to 0.
    per = (fetches.groupBy("host", "round")
           .agg(F.count(F.lit(1)).cast("long").alias("n_fetched"),
                F.sum(F.when(F.expr("status div 100") == 2, 0)
                      .otherwise(1)).cast("long").alias("n_err")))
    w = (Window.partitionBy("host").orderBy("round")
         .rangeBetween(-backoff_window, -1))
    return per.select(
        "host", F.col("round").cast("int").alias("round"),
        "n_fetched", "n_err",
        (F.coalesce(F.sum("n_err").over(w), F.lit(0))
         >= backoff_errors).alias("suppressed"))
