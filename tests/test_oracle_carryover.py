"""Cross-round crawl-delay carryover (§2.7): unused round time (≤ one delay)
rolls into the next round's budget. Pure-oracle test — the engine's parity
with the oracle is pinned by tests/test_crawl_golden.py."""
from crawlspark import oracle


def test_carryover_oscillates_budget():
    # delay 12s, round 30s: budget 2, remainder 6s -> next round (30+6)//12=3,
    # fully spent -> back to 2, ... => per-round host fetch counts 2,3,2,3
    host = "h0.test"
    urls = [f"http://{host}/p{i}" for i in range(10)]
    pages = {u: {"url": u, "status": 200, "links": [], "image_id": None,
                 "base_href": None, "meta_refresh_url": None} for u in urls}
    robots = {host: ([], 12_000)}
    res = oracle.simulate(pages, robots, urls, round_ms=30_000,
                          k_global=100, max_rounds=10)
    per_round = {}
    for r in res.fetch_log:
        per_round[r["round"]] = per_round.get(r["round"], 0) + 1
    assert [per_round[r] for r in sorted(per_round)] == [2, 3, 2, 3]
    assert len(res.fetch_log) == 10


def test_idle_host_gains_at_most_one():
    # an idle throttled host accumulates at most one delay of credit: after
    # any idle stretch the next busy round's budget is (30k+delay)//delay
    host = "h0.test"
    other = "h1.test"
    # round 0: only `other` has candidates; host joins at round 1 via links
    seed = f"http://{other}/seed"
    urls = [f"http://{host}/p{i}" for i in range(20)]
    pages = {seed: {"url": seed, "status": 200, "image_id": None,
                    "base_href": None, "meta_refresh_url": None,
                    "links": [{"href": u, "pos": i}
                              for i, u in enumerate(urls)]}}
    pages.update({u: {"url": u, "status": 200, "links": [], "image_id": None,
                      "base_href": None, "meta_refresh_url": None}
                  for u in urls})
    robots = {host: ([], 10_000), other: ([], 0)}
    res = oracle.simulate(pages, robots, [seed], round_ms=30_000,
                          k_global=100, max_rounds=10)
    by_round = {}
    for r in res.fetch_log:
        h = r["canon"].split("/")[2]
        by_round.setdefault(r["round"], {}).setdefault(h, 0)
        by_round[r["round"]][h] += 1
    # round 0: seed only; round 1: host idle in round 0 -> credit=10s ->
    # budget (30k+10k)//10k = 4 (not 3)
    assert by_round[0] == {other: 1}
    assert by_round[1][host] == 4
    # steady state afterwards: spent exactly, credit 0 -> budget 3
    assert by_round[2][host] == 3
