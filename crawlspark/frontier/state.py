"""Snapshot-per-round state store — the record/replay cache, re-expressed.

The reference persists each fetch as ``<dir>/<invokeCount>.html`` + a JSON
``.meta`` sidecar and replays byte-identically from those files
(/root/reference/session.go:143-253, /root/reference/metadata.go:19-46). Our
engine's analog is one *atomic snapshot per scheduling round*: every table
written for round r lands under ``<root>/<table>/r{r:06d}/`` and becomes
visible only when the manifest is atomically replaced (single ``os.replace``,
same all-or-nothing property as an Iceberg snapshot commit). A killed run
resumes from the last committed round; uncommitted round directories are
ignored and overwritten — which is exactly the reference's replay contract
(missing cache file → rerun in record mode, /root/reference/error.go:8-14),
made idempotent.

Tables have two flavors:
  * append  (fetch_log, seen, metrics) — read = union of all committed rounds
  * replace (frontier, seen_shards)    — read = latest committed round only

On a cluster this store is swapped for an Iceberg catalog (same semantics:
append vs replace snapshots, time travel by round); the interface is kept to
what Iceberg provides so the swap is config, not code. The local parquet+
manifest implementation exists because the sandbox has no Iceberg runtime jar.
"""

from __future__ import annotations

import json
import os
import shutil

APPEND_TABLES = {"fetch_log", "seen", "metrics",
                 # phash payload dedup (engine cfg.phash_dedup): per-round
                 # duplicate-payload records and the winners that extend the
                 # cross-round phash_seen state
                 "payload_dups", "phash_seen",
                 # payload curation gate (engine cfg.curate_images):
                 # per-round metadata-reject records (side table; the
                 # fetch log is unchanged by the stage)
                 "image_rejects",
                 # host error backoff (engine cfg.backoff_errors): per-round
                 # per-host non-2xx counts; the suppressed set is a windowed
                 # aggregate at read time
                 "host_errors",
                 # merge-on-read frontier deltas (engine.run_round step 11):
                 # per-round additions (wide rows) and removal hashes, each
                 # tagged with delta_round; the REPLACE "frontier" table is
                 # rewritten only on compaction rounds
                 "frontier_add", "frontier_rm"}
REPLACE_TABLES = {"frontier", "seen_shards", "host_state", "cookies"}
# hash-partitioned at rest (hive-style bucket=N / shard=N dirs): the
# per-bucket executor-side probe (engine._bucketed_seen_flag) reads only its
# bucket's files — the at-scale exact-decide path that never shuffles the
# seen table — and the sharded Bloom/cuckoo probe (SeenFilter
# .might_contain_sharded) reads only its shard's filter blob, so no task or
# executor ever holds the full multi-GiB blob set
PARTITIONED_TABLES = {"seen": "bucket", "seen_shards": "shard"}


class SnapshotStore:
    def __init__(self, spark, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ------------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"rounds": [], "counters": {}}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path)  # the atomic commit point

    def last_round(self) -> int:
        """Last committed round, or -1 if none."""
        rounds = self._read_manifest()["rounds"]
        return rounds[-1]["round"] if rounds else -1

    def last_committed_round(self, table: str):
        """Newest committed round that wrote ``table`` (None if never) —
        the merge-on-read cut: frontier deltas strictly newer than the
        base's round are live, older ones were folded into it."""
        rounds = [r["round"] for r in self._read_manifest()["rounds"]
                  if table in r["tables"]]
        return rounds[-1] if rounds else None

    def counters(self) -> dict:
        return dict(self._read_manifest()["counters"])

    # -- IO -------------------------------------------------------------------

    def _dir(self, table: str, round_no: int) -> str:
        return os.path.join(self.root, table, f"r{round_no:06d}")

    def commit(self, round_no: int, tables: dict, counters: dict,
               precommit=None) -> None:
        """Write all round tables, then commit them atomically via manifest.

        ``tables``: {name: DataFrame}. A crash before the manifest replace
        leaves only invisible directories (cleaned on the next attempt).

        The per-table writes are independent Spark jobs submitted from a
        thread pool — the scheduler interleaves their stages, so small
        tables (metrics, seen_shards) ride along with the big frontier
        write instead of serializing behind it. Atomicity is unchanged:
        nothing is visible until the single manifest replace.

        ``precommit``: optional callable invoked after every table write
        succeeds and BEFORE the manifest replace; raising aborts the
        commit (the round stays invisible). The engine uses it to join
        its concurrently-running payload-fidelity check.
        """
        from concurrent.futures import ThreadPoolExecutor

        def _write(item):
            name, df = item
            path = self._dir(name, round_no)
            if os.path.exists(path):  # stale uncommitted attempt
                shutil.rmtree(path)
            w = df.write.mode("overwrite")
            part = PARTITIONED_TABLES.get(name)
            if part is not None and part in df.columns:
                w = w.partitionBy(part)
            w.parquet(path)

        with ThreadPoolExecutor(max_workers=max(1, len(tables))) as ex:
            list(ex.map(_write, tables.items()))  # propagate any failure
        if precommit is not None:
            precommit()                           # abort before manifest
        manifest = self._read_manifest()
        manifest["rounds"] = [r for r in manifest["rounds"]
                              if r["round"] < round_no]
        manifest["rounds"].append(
            {"round": round_no, "tables": sorted(tables)})
        manifest["counters"] = counters
        self._write_manifest(manifest)

    def table_dirs(self, table: str, upto_round: int | None = None
                   ) -> list[str]:
        """Committed round directories for ``table`` (oldest first)."""
        manifest = self._read_manifest()
        rounds = [r for r in manifest["rounds"]
                  if table in r["tables"]
                  and (upto_round is None or r["round"] <= upto_round)]
        if table in REPLACE_TABLES:
            rounds = rounds[-1:]
        return [self._dir(table, r["round"]) for r in rounds]

    def read(self, table: str, upto_round: int | None = None):
        """Committed contents of ``table`` (append: union; replace: latest)."""
        paths = self.table_dirs(table, upto_round)
        if not paths:
            return None
        if table in PARTITIONED_TABLES and len(paths) > 1:
            # hive-partitioned roots cannot share one read.parquet call
            # (CONFLICTING_DIRECTORY_STRUCTURES) — union per-round reads
            from functools import reduce
            return reduce(lambda a, b: a.unionByName(b),
                          (self.spark.read.parquet(p) for p in paths))
        return self.spark.read.parquet(*paths)

    def read_local(self, table: str, upto_round: int | None = None):
        """Committed contents as a list of pyarrow-read row dicts — no Spark
        job, no py4j transfer (binary columns through py4j collect() are
        pathologically slow; seen_shards blobs go this way instead).

        Valid because this store's root is driver-readable (local dir /
        shared FS); the Iceberg-backed store reads the same table through
        its catalog client."""
        import pyarrow.parquet as pq

        manifest = self._read_manifest()
        rounds = [r for r in manifest["rounds"]
                  if table in r["tables"]
                  and (upto_round is None or r["round"] <= upto_round)]
        if not rounds:
            return None
        if table in REPLACE_TABLES:
            rounds = rounds[-1:]
        rows = []
        for r in rounds:
            d = self._dir(table, r["round"])
            flat = [fn for fn in sorted(os.listdir(d))
                    if fn.endswith(".parquet")]
            if flat:
                for fn in flat:
                    rows.extend(pq.read_table(os.path.join(d, fn))
                                .to_pylist())
            else:
                # hive-partitioned layout (bucket=N / shard=N subdirs):
                # dataset discovery restores the partition column
                import pyarrow.dataset as pads
                rows.extend(pads.dataset(d, format="parquet",
                                         partitioning="hive")
                            .to_table().to_pylist())
        return rows

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
