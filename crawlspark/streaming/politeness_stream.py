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
