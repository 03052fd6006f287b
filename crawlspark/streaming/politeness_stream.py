"""Streaming politeness — per-host crawl-delay budgets as stateful
Structured Streaming, with the SAME carryover arithmetic as the batch
engine (politeness.budget_col / next_host_state) so a crawl can move
between batch rounds and a streaming admission gate without changing
schedules:

    budget  = k_default                  if delay == 0
            = max(1, (round_ms + credit) // delay)
    admit   = the budget-best requests of the micro-batch, ordered by
              (priority desc, discovered_seq asc, url_hash asc) — the
              engine's total order (SURVEY.md §3.4)
    credit' = min(delay, max(0, round_ms + credit − admitted·delay))

One applyInPandasWithState group per host: state = (credit_ms,), the
micro-batch's requests arrive as pandas chunks and are ranked with numpy —
no per-row Python. Deferred rows are emitted with admitted=false (the
caller re-queues them), mirroring the batch engine's frontier carry.

KNOWN DIVERGENCE from the batch engine, by design: the batch engine's
next_host_state advances EVERY throttled host's credit each round (an idle
host accrues min(delay, credit + round_ms)), while streaming state only
updates when the host appears in a micro-batch — an idle host's credit is
frozen, not accrued. The divergence is bounded: credit is capped at one
delay, so budgets differ by at most 1 admission on the host's first batch
after an idle stretch, and whenever round_ms ≥ delay (the default 30 s
round vs typical ≤30 s delays) one non-idle batch restores exact agreement.
Deterministically closing even that gap would need per-batch ticks for
every known host (a roster joined into each micro-batch) — wall-clock state
timeouts are ruled out by the engine's no-wall-clock determinism contract.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("host string, url_hash long, priority double, "
              "discovered_seq long, crawl_delay_ms long, admitted boolean, "
              "budget long, credit_ms long")
STATE_SCHEMA = "credit_ms long"


def streaming_politeness(requests: DataFrame, round_ms: int = 30_000,
                         k_default: int = 1_000) -> DataFrame:
    """requests: streaming DataFrame with columns
    (host, url_hash, priority, discovered_seq, crawl_delay_ms).
    Returns every request row tagged admitted/deferred plus the budget and
    post-batch credit of its host."""

    def admit(key, pdf_iter, state: GroupState):
        host = key[0]
        credit = state.get[0] if state.exists else 0
        rows = pd.concat(list(pdf_iter), ignore_index=True)
        delay = int(rows["crawl_delay_ms"].fillna(0).max())
        if delay <= 0:
            budget = k_default
        else:
            budget = max(1, (round_ms + credit) // delay)
        order = rows.sort_values(
            ["priority", "discovered_seq", "url_hash"],
            ascending=[False, True, True], kind="mergesort").index
        admitted = pd.Series(False, index=rows.index)
        admitted.loc[order[:budget]] = True
        used = int(admitted.sum())
        if delay > 0:
            credit = min(delay, max(0, round_ms + credit - used * delay))
            state.update((credit,))
        out = rows.assign(admitted=admitted, budget=budget,
                          credit_ms=credit)
        out["host"] = host
        yield out[["host", "url_hash", "priority", "discovered_seq",
                   "crawl_delay_ms", "admitted", "budget", "credit_ms"]]

    return (requests
            .groupBy("host")
            .applyInPandasWithState(
                admit, OUT_SCHEMA, STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def batch_politeness(requests: DataFrame, round_ms: int = 30_000,
                     k_default: int = 1_000,
                     batch_col: str = "batch") -> DataFrame:
    """BATCH TWIN of :func:`streaming_politeness` over pre-assigned
    micro-batch indexes (``batch_col``) — the same admission arithmetic
    as one declarative plan, so the applyInPandasWithState logic has a
    value-checkable oracle row (tests pin twin == stream on the same
    feed; the driver entry value-checks the twin against DuckDB's
    recursive-CTE mirror).

    The per-host credit recurrence (budget → used → credit') folds over
    the host's ordered batch summaries with ``F.aggregate`` — a pure
    Column fold over an array bounded by batches-per-host, no Python,
    no iteration. Shuffle shape: one (host, batch) aggregate, one
    host-level fold, one per-(host, batch) ranking window, one equi-join
    of the host×batch budgets back onto the requests — all keyed by
    host, the politeness state's natural partitioning at any scale.
    """
    from pyspark.sql import Window

    acc_t = ("struct<credit:bigint,out:array<struct<"
             "batch:int,budget:bigint,credit_ms:bigint>>>")
    hb = (requests.groupBy("host", batch_col)
          .agg(F.count(F.lit(1)).cast("long").alias("n"),
               F.max(F.coalesce(F.col("crawl_delay_ms"), F.lit(0)))
               .cast("long").alias("delay")))

    def step(acc, x):
        budget = (F.when(x["delay"] <= 0, F.lit(k_default).cast("long"))
                  .otherwise(F.greatest(
                      F.lit(1).cast("long"),
                      ((F.lit(round_ms) + acc["credit"]) / x["delay"])
                      .cast("long"))))
        used = F.least(x["n"], budget)
        credit = (F.when(x["delay"] > 0, F.least(
                      x["delay"],
                      F.greatest(F.lit(0).cast("long"),
                                 F.lit(round_ms) + acc["credit"]
                                 - used * x["delay"])))
                  .otherwise(acc["credit"])).cast("long")
        row = F.struct(x["batch"].alias("batch"),
                       budget.alias("budget"),
                       credit.alias("credit_ms"))
        return F.struct(credit.alias("credit"),
                        F.concat(acc["out"], F.array(row)).alias("out"))

    folded = (hb.groupBy("host")
              .agg(F.sort_array(F.collect_list(F.struct(
                  F.col(batch_col).cast("int").alias("batch"),
                  F.col("n"), F.col("delay")))).alias("arr"))
              .select("host", F.explode(F.aggregate(
                  "arr", F.expr(f"CAST(named_struct('credit', 0L, 'out', "
                                f"array()) AS {acc_t})"),
                  step)["out"]).alias("b"))
              .select("host", F.col("b.batch").alias(batch_col),
                      F.col("b.budget").alias("budget"),
                      F.col("b.credit_ms").alias("credit_ms")))
    w = (Window.partitionBy("host", batch_col)
         .orderBy(F.col("priority").desc(), "discovered_seq", "url_hash"))
    return (requests
            .withColumn("_rn", F.row_number().over(w))
            .join(folded, ["host", batch_col])
            .select("host", "url_hash", "priority", "discovered_seq",
                    "crawl_delay_ms", F.col(batch_col).cast("int")
                    .alias(batch_col),
                    (F.col("_rn") <= F.col("budget")).alias("admitted"),
                    "budget", "credit_ms"))
