"""crawlspark — a PySpark-native web-crawl frontier + fetch scheduler.

Built from scratch (NOT a port) with the data-processing capabilities of
koizuka/scraper (reference, read-only at /root/reference). The reference is a
sequential Go scraping library; this engine re-expresses its semantics —
deterministic fetch ordering (session.go:160), link selection
(session.go:343-427), meta-refresh redirects (session.go:291-302),
record/replay caching (session.go:147-266), and the tag-driven extraction
operator set (unmarshal.go) — as declarative DataFrame jobs over snapshot
tables, extended with the scale-out machinery the north rule mandates:
Bloom/cuckoo URL-seen sets, per-host politeness budgets, robots rules, salted
skew handling, and byte-identical checkpoint/resume.

Layout:
  hashing    — xxhash64 (pure-Python == Spark's F.xxhash64; numpy-vectorized)
  urltools   — URL canonicalization (pure fn + Arrow-batched pandas UDF)
  imaging    — PNG/fake-lossy codecs, phash, PSNR (pure numpy; no PIL needed)
  synth      — deterministic synthetic tables (FIXTURES.md; seed=42)
  oracle     — pure-Python sequential crawl simulator (the golden reference)
  frontier/  — the engine: state store, seen-filters, politeness, round job
  operators/ — extraction operator library (unmarshal/form/charset semantics)
  functions/ — training-data ops: dedup, similarity, text analysis, multimodal
"""

__version__ = "0.1.0"
