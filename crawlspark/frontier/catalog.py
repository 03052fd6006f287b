"""Catalog-backed snapshot store — the SnapshotStore contract over SQL
tables instead of raw parquet directories.

`SnapshotStore` (state.py) is the local parquet+manifest implementation;
this class speaks the same interface through the Spark catalog, so swapping
the engine onto an Iceberg (or any V2) catalog is configuration, not code:

  * each logical table lives as ``<db>.<prefix>_<table>`` with a ``_round``
    column; append tables accumulate rounds, replace tables are read at
    their latest committed round (Iceberg's snapshot-per-commit model maps
    1:1 — with an Iceberg catalog each round IS a table snapshot and
    ``upto_round`` reads could use time travel instead of the filter);
  * the COMMIT POINT is a single atomic overwrite of the tiny
    ``<prefix>_manifest`` table (one row per committed round + counters
    JSON): writers prepare all round data first, readers only trust rounds
    listed there — the same all-or-nothing property the file store gets
    from its ``os.replace`` and Iceberg from a snapshot commit;
  * tables are created EXTERNAL under ``root`` so the store works against
    any warehouse/catalog configuration (and on Iceberg, ``USING iceberg``
    replaces ``USING parquet`` — see ``provider``).

In-sandbox this runs on the built-in session catalog with parquet tables
(no Iceberg runtime jar is available); the full engine passes its golden
oracle tests on it (tests/test_catalog_store.py), which is the evidence the
store swap is behavior-preserving.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ..session import ckpt
from .state import APPEND_TABLES, PARTITIONED_TABLES, REPLACE_TABLES


class CatalogStore:
    def __init__(self, spark, root: str, prefix: str = "crawl",
                 provider: str = "parquet", database: str = "default"):
        self.spark = spark
        self.root = root
        self.prefix = prefix
        self.provider = provider
        self.db = database

    # -- naming ---------------------------------------------------------------

    def _tbl(self, table: str) -> str:
        return f"{self.db}.{self.prefix}_{table}"

    def _exists(self, table: str) -> bool:
        return self.spark.catalog.tableExists(self._tbl(table))

    # -- manifest -------------------------------------------------------------

    def _manifest_rows(self) -> list:
        if not self._exists("manifest"):
            return []
        return self.spark.table(self._tbl("manifest")).collect()

    @staticmethod
    def _generation(all_rows: list, seq: int) -> dict:
        rows = sorted((r for r in all_rows if r["commit_seq"] == seq),
                      key=lambda r: r["round"])
        return {
            "rounds": [{"round": int(r["round"]),
                        "tables": json.loads(r["tables"])} for r in rows],
            "counters": (json.loads(rows[-1]["counters"]) if rows else {}),
        }

    def _read_manifest(self) -> dict:
        all_rows = self._manifest_rows()
        if not all_rows:
            return {"rounds": [], "counters": {}}
        # readers trust only the newest complete manifest snapshot: each
        # commit appends the FULL round list as ONE file under a fresh
        # commit_seq (file rename is the atomic publish on the parquet
        # session catalog; on Iceberg the append is a snapshot commit), so
        # a crash mid-commit leaves the previous snapshot intact instead of
        # a truncated table.
        top = max(r["commit_seq"] for r in all_rows)
        return self._generation(all_rows, top)

    def last_round(self) -> int:
        rounds = self._read_manifest()["rounds"]
        return rounds[-1]["round"] if rounds else -1

    def last_committed_round(self, table: str):
        """Newest committed round that wrote ``table`` (None if never)."""
        rounds = [r["round"] for r in self._read_manifest()["rounds"]
                  if table in r["tables"]]
        return rounds[-1] if rounds else None

    def counters(self) -> dict:
        return dict(self._read_manifest()["counters"])

    # -- IO -------------------------------------------------------------------

    def _write_round(self, name: str, df, round_no: int) -> None:
        tbl = self._tbl(name)
        data = df.withColumn("_round", F.lit(round_no))
        part_cols = ["_round"]
        extra = PARTITIONED_TABLES.get(name)
        if extra is not None and extra in df.columns:
            part_cols.append(extra)
        # insertInto matches POSITIONALLY and upstream joins reorder
        # columns — canonicalize to sorted(non-partition) + partition cols
        # on both the CREATE and every insert (partition columns must sit
        # at the end of a datasource table's schema)
        non_part = sorted(c for c in data.columns if c not in part_cols)
        data = data.select(*non_part, *part_cols)
        if not self._exists(name):
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in data.schema.fields)
            self.spark.sql(
                f"CREATE TABLE {tbl} ({cols}) USING {self.provider} "
                f"PARTITIONED BY ({', '.join(part_cols)}) "
                f"LOCATION '{self.root}/{name}'")
        # idempotent per-round overwrite: a crashed attempt's partition is
        # replaced wholesale on retry (dynamic partition overwrite). The
        # session catalog refuses to overwrite a table its own lineage
        # reads (the new round derives from the previous one), so the data
        # is materialized first; Iceberg's snapshot isolation makes that
        # unnecessary there.
        if self.provider != "iceberg":
            data = ckpt(data)
        data.write.mode("overwrite").insertInto(tbl)

    def commit(self, round_no: int, tables: dict, counters: dict,
               precommit=None) -> None:
        """Same contract as SnapshotStore.commit: ``precommit`` (if given)
        runs after every table write and BEFORE the manifest snapshot —
        raising leaves the round invisible (the manifest's commit_seq cut
        ignores orphaned partition data)."""
        from concurrent.futures import ThreadPoolExecutor

        # dynamic partition overwrite must be a SESSION conf for insertInto
        # (the writer option is ignored on that path) — without it a commit
        # would wipe every previous round's partition
        conf = "spark.sql.sources.partitionOverwriteMode"
        prev = self.spark.conf.get(conf, "STATIC")
        self.spark.conf.set(conf, "dynamic")
        try:
            with ThreadPoolExecutor(max_workers=max(1, len(tables))) as ex:
                list(ex.map(
                    lambda kv: self._write_round(kv[0], kv[1], round_no),
                    tables.items()))
        finally:
            self.spark.conf.set(conf, prev)
        if precommit is not None:
            precommit()               # abort before the manifest snapshot
        manifest = self._read_manifest()
        next_seq = self._next_commit_seq()
        rounds = [r for r in manifest["rounds"] if r["round"] < round_no]
        rounds.append({"round": round_no, "tables": sorted(tables)})
        rows = [(r["round"], json.dumps(r["tables"]), json.dumps(counters),
                 next_seq)
                for r in rounds]
        mdf = self.spark.createDataFrame(
            rows, "round int, tables string, counters string, "
                  "commit_seq int")
        if not self._exists("manifest"):
            self.spark.sql(
                f"CREATE TABLE {self._tbl('manifest')} "
                f"(round int, tables string, counters string, "
                f"commit_seq int) "
                f"USING {self.provider} "
                f"LOCATION '{self.root}/_manifest'")
        # the commit point: a full manifest snapshot APPENDED as one file
        # under a fresh commit_seq — the single-file rename publishes
        # all-or-nothing on the parquet session catalog (readers pick the
        # max complete commit_seq); on Iceberg the append is itself an
        # atomic snapshot commit. Never truncate-then-rewrite: a crash in
        # between would lose every committed round.
        mdf.coalesce(1).write.mode("append").insertInto(self._tbl("manifest"))

    def _next_commit_seq(self) -> int:
        if not self._exists("manifest"):
            return 0
        row = (self.spark.table(self._tbl("manifest"))
               .agg(F.max("commit_seq").alias("m")).collect()[0])
        return 0 if row["m"] is None else int(row["m"]) + 1

    def read(self, table: str, upto_round: int | None = None):
        return self._read_in(self._read_manifest(), table, upto_round)

    # -- snapshot maintenance (Iceberg's snapshots/expire/orphans model) -------

    def snapshots(self) -> list[dict]:
        """Metadata listing of every retained manifest generation (the
        analog of Iceberg's ``.snapshots`` table): one dict per commit_seq
        with the rounds it makes visible, oldest first."""
        all_rows = self._manifest_rows()
        out = []
        for seq in sorted({int(r["commit_seq"]) for r in all_rows}):
            gen = self._generation(all_rows, seq)
            out.append({"commit_seq": seq,
                        "rounds": [r["round"] for r in gen["rounds"]],
                        "counters": gen["counters"]})
        return out

    def read_as_of(self, table: str, commit_seq: int,
                   upto_round: int | None = None):
        """Time travel: read ``table`` exactly as the manifest generation
        ``commit_seq`` published it (Iceberg's ``VERSION AS OF``). Raises
        KeyError for an unknown/expired generation — an expired snapshot
        is gone, not silently empty."""
        all_rows = self._manifest_rows()
        if not any(int(r["commit_seq"]) == commit_seq for r in all_rows):
            raise KeyError(f"snapshot commit_seq={commit_seq} not found "
                           "(never committed, or expired)")
        gen = self._generation(all_rows, commit_seq)
        return self._read_in(gen, table, upto_round)

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` manifest generations and
        return the expired commit_seqs. Readers of retained generations
        are unaffected (each generation row set is self-contained).

        On Iceberg this is the atomic ``expire_snapshots`` procedure; on
        the parquet session catalog the manifest rewrite is published via
        the write-job commit protocol (staging dir + rename), so a crash
        can at worst leave the OLD manifest — never a truncated one.
        """
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        all_rows = self._manifest_rows()
        seqs = sorted({int(r["commit_seq"]) for r in all_rows})
        expired = seqs[:-keep_last]
        if not expired:
            return []
        keep = ckpt(self.spark.table(self._tbl("manifest"))
                    .filter(F.col("commit_seq") > expired[-1]))
        keep.coalesce(1).write.mode("overwrite").insertInto(
            self._tbl("manifest"))
        return expired

    def orphan_rounds(self, table: str) -> list[int]:
        """Round partitions physically present in ``table`` but referenced
        by NO retained manifest generation — crashed-commit leftovers (the
        analog of Iceberg's ``remove_orphan_files`` discovery pass)."""
        if not self._exists(table):
            return []
        all_rows = self._manifest_rows()
        referenced = set()
        for seq in {int(r["commit_seq"]) for r in all_rows}:
            for r in self._generation(all_rows, seq)["rounds"]:
                if table in r["tables"]:
                    referenced.add(r["round"])
        parts = self.spark.sql(
            f"SHOW PARTITIONS {self._tbl(table)}").collect()
        present = set()
        for p in parts:
            for piece in p["partition"].split("/"):
                k, _, v = piece.partition("=")
                if k == "_round":
                    present.add(int(v))
        return sorted(present - referenced)

    def remove_orphans(self, tables=None) -> dict[str, list[int]]:
        """Drop unreferenced round partitions (crashed-commit leftovers)
        from the given tables (default: every store table). Returns the
        dropped rounds per table. Safe by construction: only partitions no
        retained generation references are touched, so every ``read`` /
        ``read_as_of`` result is unchanged."""
        removed: dict[str, list[int]] = {}
        names = sorted(APPEND_TABLES | REPLACE_TABLES) \
            if tables is None else list(tables)
        for name in names:
            orphans = self.orphan_rounds(name)
            for rnd in orphans:
                self.spark.sql(
                    f"ALTER TABLE {self._tbl(name)} DROP IF EXISTS "
                    f"PARTITION (_round={rnd})")
            if orphans:
                removed[name] = orphans
        return removed

    def _read_in(self, manifest: dict, table: str,
                 upto_round: int | None = None):
        rounds = [r["round"] for r in manifest["rounds"]
                  if table in r["tables"]
                  and (upto_round is None or r["round"] <= upto_round)]
        if not rounds or not self._exists(table):
            return None
        df = self.spark.table(self._tbl(table))
        if table in REPLACE_TABLES:
            df = df.filter(F.col("_round") == rounds[-1])
        else:
            df = df.filter(F.col("_round").isin(rounds))
        return df.drop("_round")

    def read_local(self, table: str, upto_round: int | None = None):
        df = self.read(table, upto_round)
        if df is None:
            return None
        return [row.asDict() for row in df.collect()]

    def table_dirs(self, table: str, upto_round: int | None = None):
        """File-layout hook used by the per-bucket seen probe. For catalog
        tables the engine falls back to the join path when this returns
        empty; on Iceberg the probe would instead use the metadata tables
        to list per-bucket data files."""
        return []

    def destroy(self) -> None:
        import shutil
        for t in sorted(APPEND_TABLES | REPLACE_TABLES | {"manifest"}):
            self.spark.sql(f"DROP TABLE IF EXISTS {self._tbl(t)}")
        shutil.rmtree(self.root, ignore_errors=True)


def compaction_plan(files, part_col: str = "part", path_col: str = "path",
                    size_col: str = "size_bytes",
                    target_bytes: int = 512 * 1024 * 1024):
    """Small-file compaction planner over a table's file listing.

    A crawl that commits a snapshot per round writes many small files per
    partition (this store and Iceberg both do); read amplification at
    100 TB is governed by file count, so maintenance jobs periodically
    rewrite each partition's small files into ~target-size groups
    (Iceberg's rewrite_data_files binpack strategy is the public model).
    This emits the PLAN: every file assigned to a rewrite group,

        (part, path, size_bytes, bin)

    with deterministic size-descending virtual-concatenation packing
    within each partition: order files by (size DESC, path ASC), then
    ``bin = running_sum_of_previous_sizes div target_bytes``. That is the
    same packing rule Spark's own file-scan batching
    (``files.maxPartitionBytes``) applies, chosen over first-fit-decreasing
    because it is a pure window expression — the plan for a million-file
    listing is ONE shuffle by partition key and a per-partition window,
    no driver-side loop over files — and its worst case vs optimal
    bin-packing is bounded (each bin except the last holds > target/2
    once any file exceeds it is alone in its bin).

    The input is a metadata listing (from the manifest, Iceberg's
    ``.files`` table, or a filesystem scan) — never the data itself.
    """
    from pyspark.sql import Window
    w = (Window.partitionBy(part_col)
         .orderBy(F.col(size_col).desc(), F.col(path_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    # exact integer division (Spark `div` == DuckDB `//` on non-negatives);
    # float `/` + cast would wobble once partition byte totals pass 2^53
    return (files
            .select(part_col, path_col, size_col, before.alias("_before"))
            .withColumn("bin", F.expr(f"_before div {int(target_bytes)}")
                        .cast("long"))
            .drop("_before"))
