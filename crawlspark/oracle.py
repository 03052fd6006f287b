"""Sequential pure-Python crawl oracle — the golden reference for the engine.

Implements EXACTLY the round contract documented in
crawlspark.frontier.engine (steps 1-11), with plain dicts/sorts — no Spark.
The golden tests (tests/test_crawl_golden.py) run the PySpark engine and this
simulator over the same synthetic graph and assert the ``fetch_seq`` sequence
and the seen-set are equal element-for-element, at multiple parallelism
levels — the testable form of BASELINE.json's "crawl-order/URL-seen exact
match vs reference under the same seed list and politeness budget".

The ordering semantics this encodes are anchored to the reference:
  * one monotone fetch counter — invokeCount, /root/reference/session.go:160
  * link choice in document order — FollowLink/FollowSelectionLink,
    /root/reference/session.go:343-427
  * meta-refresh followed depth-1, immediately, within the same navigation —
    /root/reference/session.go:278-307, /root/reference/page.go:18-31
  * base-href override — /root/reference/response.go:86-94
plus the north-rule additions (seen-set, robots, politeness budgets) the
reference does not have (SURVEY.md §3.4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .hashing import xxh64_str
from .urltools import canonicalize, host_of, path_of

# cookie default-path (RFC 6265 §5.1.4): the setting URL's path up to —
# not including — the last "/" (the engine's regexp_replace twin)
_re_cookie_dir = re.compile(r"/[^/]*$")


def cookie_get(jar0: dict, host: str, path: str, name: str, rnd: int):
    """RFC 6265 §5.4 match+selection — the engine's suffix-join +
    min_by(struct(-path_len, set_seq, domain, path, host_only, value))
    re-derived sequentially. Module-level so the randomized differential
    test (tests/test_crawl_cookies.py) can drive it head-to-head against
    the engine's Column implementation outside a full crawl."""
    best = None
    for (dom, ho, cp, nm), (val, seq, exp) in jar0.items():
        if nm != name:
            continue
        if ho:
            if host != dom:
                continue
        elif not (host == dom or host.endswith("." + dom)):
            continue
        if exp is not None and rnd > exp:
            continue
        if not (path == cp or (path.startswith(cp)
                               and (cp.endswith("/")
                                    or path[len(cp):len(cp) + 1]
                                    == "/"))):
            continue
        cand = (-len(cp), seq, dom, cp, ho, val)
        if best is None or cand < best:
            best = cand
    return None if best is None else best[5]


def apply_set_cookie(jar: dict, seq: int, host: str, ppath: str,
                     c: dict, rnd: int, rd_fn=None) -> None:
    """RFC 6265 §5.3 setting rules (the engine harvest's sequential
    mirror): Domain validation against the setting host + its
    registrable domain, default path, Max-Age→expires_round, and the
    max(set_seq, value, expiry) merge. Mutates ``jar`` in place; expiry
    PRUNING stays with the caller (it is a round-end sweep).
    ``rd_fn`` swaps the registrable-domain resolver (full-PSL twin:
    psl.py_registrable_domain_psl) — the engine-side analog is
    CrawlConfig.psl."""
    from .urltools import py_registrable_domain
    if rd_fn is None:
        rd_fn = py_registrable_domain
    dattr = c.get("domain")
    if dattr is not None:
        d = dattr[1:] if dattr.startswith(".") else dattr
        d = d.lower()
        rd = rd_fn(host)
        if not (host == d or host.endswith("." + d)):
            return
        if rd is None or not (d == rd or d.endswith("." + rd)):
            return
        domain, host_only = d, False
    else:
        domain, host_only = host, True
    cpath = c.get("path")
    if cpath is None or not cpath.startswith("/"):
        dp = _re_cookie_dir.sub("", ppath or "")
        cpath = dp if dp else "/"
    ma = c.get("max_age")
    exp = (rnd + int(ma)) if ma is not None else None
    key = (domain, host_only, cpath, c["name"])
    new = (c["value"], seq, exp)
    old = jar.get(key)
    if old is None or ((new[1], new[0], new[2] is not None, new[2] or 0)
                       > (old[1], old[0], old[2] is not None,
                          old[2] or 0)):
        jar[key] = new


@dataclass
class OracleResult:
    fetch_log: list = field(default_factory=list)  # dicts, in fetch_seq order
    seen: set = field(default_factory=set)         # url_hash values
    rounds: int = 0
    payload_dups: list = field(default_factory=list)  # phash-dedup records
    image_rejects: list = field(default_factory=list)  # curation records


def _key(row) -> tuple:
    return (-row["priority"], row["discovered_seq"], row["url_hash"])


def simulate(pages_by_url: dict, robots: dict, seeds: list,
             round_ms: int = 30_000, k_global: int = 1_000,
             max_rounds: int = 100, auto_submit_forms: bool = False,
             form_encoding: str | None = None,
             initial_cookies: dict | None = None,
             image_phash: dict | None = None,
             phash_dedup: bool = False,
             trap_max_urls: int | None = None,
             backoff_errors: int | None = None,
             backoff_window: int = 2,
             image_meta: dict | None = None,
             curate_images: bool = False,
             curate_min_side: int = 48,
             curate_aspect_num: int = 3,
             curate_aspect_den: int = 1,
             curate_min_caption_tokens: int = 4,
             psl_rules=None) -> OracleResult:
    """pages_by_url: canonical url -> page dict (FIXTURES.md §2 row shape);
    robots: host -> (disallow_prefixes, crawl_delay_ms);
    seeds: [url, ...] in seed_pos order.

    ``auto_submit_forms``: S3 (/root/reference/form.go:338-401) — a 2xx
    page carrying a GET form also discovers its submit URL (action +
    sorted urlencoded defaults, values re-encoded into ``form_encoding``),
    as a child in the reserved document-order slot FORM_POS.

    Cookie jar (S7 — /root/reference/session.go:67-110): fetches in round r
    see the jar as of the END of round r-1 (the engine's fetches are
    parallel — no intra-round cookie ride). A page whose ``require_cookie``
    ("name" or "name=value") is unsatisfied is a 403 with no content (no
    image, links, refresh, form, or Set-Cookie). 2xx pages' ``set_cookies``
    apply at round end, latest (seq, value) per (host, name) winning.
    ``initial_cookies``: {host: {name: value}} — the LoadCookie analog.

    Robots values come in two shapes (matching the engine, which accepts
    both the legacy prefix fixtures and frontier.robots parser output):
      * (disallow_prefixes, crawl_delay_ms) — prefix-startswith semantics;
      * {"rules": [(allow, pattern), ...], "crawl_delay_ms": int} — full
        RFC 9309 longest-match, decided by frontier.robots.rule_allows
        (e.g. the output of parse_robots over fetched /robots.txt bodies).

    ``trap_max_urls`` (engine cfg.trap_max_urls): once a (host,
    digit-collapsed path template) has accumulated that many FETCHED urls,
    children matching it stop being inserted. Round r's insert uses counts
    through round r-1, exactly like the engine's committed trap_counts
    state.

    ``backoff_errors``/``backoff_window`` (engine cfg.backoff_errors /
    cfg.backoff_window): a host whose non-2xx fetch count over rounds
    [r - backoff_window, r-1] reaches the threshold is excluded from
    scheduling in round r (its frontier rows stay put — they re-enter the
    pool when the errors age out of the window). Applied AFTER the seen
    filter, exactly like the engine's broadcast anti-join on the
    scheduling pool.
    """
    from .frontier.robots import rule_allows

    # ``psl_rules``: full-PSL cookie-Domain validation twin of the
    # engine's CrawlConfig.psl (crawlspark.psl.PslRules); None ⇒ the
    # urltools subset fast path.
    rd_fn = None
    if psl_rules is not None:
        from .psl import py_registrable_domain_psl

        def rd_fn(h, _rules=psl_rules):
            return py_registrable_domain_psl(h, _rules)

    res = OracleResult()
    # RFC 6265-scoped jar (mirrors the engine's cookies state table):
    # (domain, host_only, path, name) -> (value, set_seq, expires_round).
    # {host: {name: value}} preloads normalize to host-only scope.
    jar: dict[tuple, tuple] = {
        (h, True, "/", n): (v, 0, None)
        for h, m in (initial_cookies or {}).items() for n, v in m.items()}

    # phash payload dedup (engine cfg.phash_dedup): first fetch of each
    # exact perceptual hash — in fetch_seq order, across rounds — wins;
    # later fetches are recorded as duplicates of that winner.
    # ``image_phash``: image_id -> phash (the images table's metadata).
    phash_first: dict[int, int] = {}

    def note_payload(rnd: int, seq: int, image_id) -> None:
        _note_curation(rnd, seq, image_id)
        if not phash_dedup or image_id is None:
            return
        ph = (image_phash or {}).get(image_id)
        if ph is None:
            return
        first = phash_first.get(ph)
        if first is None:
            phash_first[ph] = seq
        else:
            res.payload_dups.append({
                "round": rnd, "fetch_seq": seq, "image_id": image_id,
                "phash": ph, "dup_of": first})

    # payload curation gate (engine cfg.curate_images): record the FIRST
    # failing reason (min_side → aspect → caption, the engine's fixed
    # order) for every fetched 2xx image. ``image_meta``:
    # image_id -> (w, h, caption).
    def _note_curation(rnd: int, seq: int, image_id) -> None:
        if not curate_images or image_id is None:
            return
        meta = (image_meta or {}).get(image_id)
        if meta is None:
            return
        w, h, caption = meta
        reason = None
        if min(w, h) < curate_min_side:
            reason = "min_side"
        elif (w * curate_aspect_den > h * curate_aspect_num
              or h * curate_aspect_den > w * curate_aspect_num):
            reason = "aspect"
        elif len([t for t in (caption or "").split(" ")
                  if t]) < curate_min_caption_tokens:
            reason = "caption"
        if reason is not None:
            res.image_rejects.append({
                "round": rnd, "fetch_seq": seq, "image_id": image_id,
                "reason": reason})

    def _norm(v):
        if isinstance(v, dict):
            return (list(v.get("rules") or []),
                    int(v.get("crawl_delay_ms") or 0), True)
        prefixes, delay = v
        return (list(prefixes), int(delay), False)

    robots_n = {h: _norm(v) for h, v in robots.items()}

    def served(page: dict, host: str, path: str, jar0: dict,
               rnd: int) -> bool:
        req = page.get("require_cookie")
        if req is None:
            return True
        name, sep, want = req.partition("=")
        got = cookie_get(jar0, host, path, name, rnd)
        return (got == want) if sep else (got is not None)

    def robots_blocked(host: str, path: str) -> bool:
        rules, _delay, is_rep = robots_n.get(host, ([], 0, False))
        if is_rep:
            return not rule_allows(path, rules)
        return any(path.startswith(p) for p in rules)

    # robots disallow rules apply at INSERT time (static per run — identical
    # decisions to pop-time filtering), mirroring the engine invariant that
    # every frontier row is robots-allowed.
    frontier: list[dict] = []
    for pos, url in enumerate(seeds):
        canon = canonicalize(url)
        if canon is None:
            continue
        host, path = host_of(canon), path_of(canon)
        if robots_blocked(host, path):
            continue
        frontier.append({
            "canon": canon, "url_hash": xxh64_str(canon),
            "host": host, "path": path,
            "priority": 0.0, "discovered_seq": pos, "ref_url": None,
        })
    base_seq = 0
    credit: dict[str, int] = {}  # host -> credit_ms (§2.7 carryover)
    trap_n: dict[tuple, int] = {}  # (host, template) -> fetched-url count
    err_by_round: list[dict] = []  # per round: host -> non-2xx count

    def _tmpl(path: str) -> str:
        return re.sub(r"[0-9]+", "N", path)

    for r in range(max_rounds):
        # 1. dedup by url_hash — keep best by (priority desc, discovered_seq)
        best: dict[int, dict] = {}
        for row in frontier:
            k = row["url_hash"]
            cur = best.get(k)
            if cur is None or ((-row["priority"], row["discovered_seq"])
                               < (-cur["priority"], cur["discovered_seq"])):
                best[k] = row
        # 2. seen
        cand = [v for v in best.values() if v["url_hash"] not in res.seen]
        # 3-4. budget (disallow rules were applied at insert)
        allowed = []
        for row in cand:
            delay = robots_n.get(row["host"], ([], 0, False))[1]
            row = dict(row)
            # budget with cross-round carryover: unused round time (≤ one
            # delay) rolls forward — same arithmetic as politeness.budget_col
            row["budget"] = (k_global if delay == 0 else
                             max(1, (round_ms + credit.get(row["host"], 0))
                                 // delay))
            allowed.append(row)
        # 4b. host backoff: hosts over the trailing-window error threshold
        # leave the SCHEDULING pool only — their rows stay in `allowed`
        # (hence in `remaining` below), exactly like the engine's
        # broadcast anti-join after the seen filter.
        suppressed: set = set()
        if backoff_errors is not None:
            window = err_by_round[max(0, r - backoff_window):r]
            totals: dict[str, int] = {}
            for d in window:
                for h, n in d.items():
                    totals[h] = totals.get(h, 0) + n
            suppressed = {h for h, n in totals.items()
                          if n >= backoff_errors}
        # 5. per-host top-K
        survivors = []
        per_host: dict[str, int] = {}
        for row in sorted(allowed, key=_key):
            if row["host"] in suppressed:
                continue
            n = per_host.get(row["host"], 0)
            if n < row["budget"]:
                per_host[row["host"]] = n + 1
                survivors.append(row)
        # 6. global limit
        scheduled = sorted(survivors, key=_key)[:k_global]
        if not scheduled:
            break
        scheduled_hashes = {row["url_hash"] for row in scheduled}

        # 7-8. fetch + refresh claims (first parent in idx order wins).
        # jar0 = the round-start cookie snapshot every fetch this round sees.
        jar0 = dict(jar)
        cookie_updates: list[tuple] = []   # (seq, host, page_path, cookie)
        fetch_plan = []
        claims: dict[int, int] = {}  # r_hash -> parent idx
        for idx, row in enumerate(scheduled):
            page = pages_by_url.get(row["canon"])
            ok = page is not None and served(
                page, row["host"], path_of(row["canon"]), jar0, r)
            status = (403 if page is not None and not ok
                      else page["status"] if page is not None else 404)
            refresh = None
            if ok and status // 100 == 2 and page.get("meta_refresh_url"):
                base = page.get("base_href") or row["canon"]
                rc = canonicalize(page["meta_refresh_url"], base)
                if rc is not None:
                    rh = xxh64_str(rc)
                    if (rh not in res.seen and rh not in scheduled_hashes
                            and rh not in claims):
                        claims[rh] = idx
                        refresh = (rc, rh)
            fetch_plan.append((row, page, status, refresh, ok))

        # 9-10. sequence assignment + expansion
        children = []
        seq = base_seq
        n_fetched = 0
        for idx, (row, page, status, refresh, ok) in enumerate(fetch_plan):
            seq += 1
            n_fetched += 1
            res.fetch_log.append({
                "round": r, "fetch_seq": seq, "canon": row["canon"],
                "ref_url": row["ref_url"], "status": status,
                "is_refresh": False,
                "image_id": page["image_id"] if page and ok else None,
            })
            res.seen.add(row["url_hash"])
            if ok and status // 100 == 2:
                note_payload(r, seq, page["image_id"])
                children.extend(_expand(page, row["canon"], row["priority"],
                                        seq, auto_submit_forms,
                                        form_encoding))
                for c in page.get("set_cookies") or []:
                    cookie_updates.append(
                        (seq, row["host"], path_of(row["canon"]), c))
            if refresh is not None:
                rc, rh = refresh
                rhost = host_of(rc)
                rpage = pages_by_url.get(rc)
                rok = rpage is not None and served(
                    rpage, rhost, path_of(rc), jar0, r)
                rstatus = (403 if rpage is not None and not rok
                           else rpage["status"] if rpage is not None else 404)
                seq += 1
                n_fetched += 1
                res.fetch_log.append({
                    "round": r, "fetch_seq": seq, "canon": rc,
                    "ref_url": row["canon"], "status": rstatus,
                    "is_refresh": True,
                    "image_id": rpage["image_id"] if rpage and rok else None,
                })
                res.seen.add(rh)
                if rok and rstatus // 100 == 2:
                    note_payload(r, seq, rpage["image_id"])
                    children.extend(_expand(rpage, rc, row["priority"], seq,
                                            auto_submit_forms,
                                            form_encoding))
                    for c in rpage.get("set_cookies") or []:
                        cookie_updates.append(
                            (seq, rhost, path_of(rc), c))
        base_seq = seq

        # host-error tally (engine host_errors append table): this round's
        # non-2xx fetches per host — primaries AND refreshes, the same
        # all_fetched rows the engine aggregates at commit
        round_errs: dict[str, int] = {}
        for e in res.fetch_log[len(res.fetch_log) - n_fetched:]:
            if e["status"] // 100 != 2:
                h = host_of(e["canon"])
                round_errs[h] = round_errs.get(h, 0) + 1
        err_by_round.append(round_errs)

        # cookie-jar merge at round end (RFC 6265 §5.3, mirroring the
        # engine's harvest): Domain attribute validated against the
        # setting host + its registrable domain (invalid ⇒ cookie
        # ignored), default path = setting URL's directory, Max-Age in
        # rounds ⇒ expires_round; latest max(set_seq, value, expiry) per
        # (domain, host_only, path, name) wins; expired rows prune.
        for seq, host, ppath, c in sorted(cookie_updates,
                                          key=lambda t: t[0]):
            apply_set_cookie(jar, seq, host, ppath, c, r, rd_fn=rd_fn)
        jar = {k: v for k, v in jar.items()
               if v[2] is None or v[2] >= r + 1}

        # 11a. politeness carryover update (primaries only — refreshes are
        # outside budget accounting): credit' = min(delay,
        # max(0, round_ms + credit − used·delay)) per throttled host
        used: dict[str, int] = {}
        for row in scheduled:
            used[row["host"]] = used.get(row["host"], 0) + 1
        for host, (_rules, delay, _is_rep) in robots_n.items():
            if delay and delay > 0:
                c = credit.get(host, 0)
                credit[host] = min(
                    delay,
                    max(0, round_ms + c - used.get(host, 0) * delay))

        # 11b. trap suppression: this round's inserts use counts through
        # round r-1 (the engine's committed trap_counts state); the
        # round's own fetches roll in AFTER the flagged snapshot
        flagged0: set = set()
        if trap_max_urls is not None:
            flagged0 = {ht for ht, n in trap_n.items()
                        if n >= trap_max_urls}
            for e in res.fetch_log[len(res.fetch_log) - n_fetched:]:
                ht = (host_of(e["canon"]), _tmpl(path_of(e["canon"])))
                trap_n[ht] = trap_n.get(ht, 0) + 1

        # 11. next frontier: deferred survivors-of-1-3 + children
        # (children hit the insert-time robots filter here)
        remaining = [row for row in allowed
                     if row["url_hash"] not in scheduled_hashes]
        frontier = remaining + [
            c for c in children
            if c["url_hash"] not in res.seen
            and not robots_blocked(c["host"], c["path"])
            and (c["host"], _tmpl(c["path"])) not in flagged0]
        res.rounds = r + 1
    return res


# document-order slot of the auto-submitted form child: after every link
# (synthetic pages top out well below it; equal-seq ties would still be
# broken by the url_hash tiebreaker)
FORM_POS = 99


def _expand(page: dict, parent_canon: str, parent_priority: float,
            parent_seq: int, auto_submit_forms: bool = False,
            form_encoding: str | None = None) -> list[dict]:
    base = page.get("base_href") or parent_canon
    out = []
    hrefs = [(link["href"], link["pos"])
             for link in page.get("links") or []]
    # gate on `is not None`, NOT truthiness: an empty action="" is a legal
    # submit-to-current-URL form (HTML semantics — the href resolves
    # relative against the base downstream), and the engine fetch stage
    # filters form_action.isNotNull() the same way
    if (auto_submit_forms and page.get("form_action") is not None
            and (page.get("form_method") or "get").lower() == "get"):
        href = _form_submit_href(page, form_encoding)
        if href is not None:
            hrefs.append((href, FORM_POS))
    for href, pos in hrefs:
        child = canonicalize(href, base)
        if child is None:
            continue
        out.append({
            "canon": child, "url_hash": xxh64_str(child),
            "host": host_of(child), "path": path_of(child),
            "priority": parent_priority - 1,
            "discovered_seq": parent_seq * 100 + pos,
            "ref_url": parent_canon,
        })
    return out


def _form_submit_href(page: dict, encoding: str | None) -> str | None:
    """Independent twin of forms.submit_href (the golden contract wants the
    oracle to re-derive, not share, the engine's resolution code): one
    rank-based pass chooses each group's element, then sorted urlencode
    via pyref's own percent-encoder."""
    from .functions.pyref import _py_query_escape

    best: dict[str, tuple] = {}   # name -> (rank, pos, type, value)
    for el in page.get("form_inputs") or []:
        name = el.get("name")
        if name is None:
            continue
        typ = el.get("type") or "text"
        value = el.get("value")
        if typ == "radio" and value is None:
            value = "on"
        if value is None:
            continue
        if typ == "radio":
            rank = 0 if el.get("checked") else 1
        elif typ == "checkbox":
            rank = 0 if el.get("checked") else 2   # 2 = never chosen
        elif typ == "select":
            rank = 0 if el.get("selected") else 1
        else:
            rank = 1
        key = (rank, el.get("pos", 0))
        if name not in best or key < best[name][:2]:
            best[name] = (key[0], key[1], typ, value)
    params = [(n, v) for n, (rank, _pos, _t, v) in best.items() if rank < 2]
    if encoding is not None:
        enc = []
        for n, v in params:
            acc = bytearray()
            for ch in v:
                try:
                    acc += ch.encode(encoding)
                except UnicodeEncodeError:
                    break
            enc.append((n, bytes(acc)))
    else:
        enc = [(n, v.encode("utf-8")) for n, v in params]
    query = "&".join(
        _py_query_escape(n.encode("utf-8")) + "=" + _py_query_escape(vb)
        for n, vb in sorted(enc))
    action = page["form_action"]
    sep = "&" if "?" in action else "?"
    return action + sep + query if query else action
