"""Snapshot-committed table layer: Iceberg semantics on plain parquet.

This sandbox's PySpark ships no Iceberg runtime jar (SURVEY.md §7.0), so the
pipeline codes against this thin layer instead: an output table is a
directory of immutable parquet data files plus a `_manifest/` of JSON
snapshots; `current` is flipped by atomic rename, so a commit is all-or-
nothing exactly like an Iceberg snapshot swap. On a cluster with Iceberg
available, `commit()`/`committed_partitions()` map 1:1 onto an Iceberg
append + audit-table scan.

Resume model (north rule): every row carries a stable bucket
`part_key = pmod(xxhash64(url), n_buckets)`. A run anti-joins its input
against the already-committed buckets, processes only the remainder, and
commits the new data files together with one audit/lineage row per bucket
(partition_id, url_range, doc_count, sha256 of the url-ordered per-url text
hashes). Killing a run between data write and manifest flip leaves the table
at the previous snapshot — rerunning is idempotent.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64


def part_key(col, n_buckets: int = DEFAULT_BUCKETS):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def content_digest(url_col: str, text_col: str):
    """The per-partition lineage digest: sha256 over the url-sorted
    concatenation of per-url sha256(text). Order-stable at any
    parallelism (the array_sort pins the order inside the agg buffer) and
    null-total (missing text hashes as '')."""
    return F.sha2(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(url_col).alias("u"),
                            F.sha2(F.coalesce(F.col(text_col), F.lit("")),
                                   256).alias("h"),
                        )
                    )
                ),
                lambda s: s["h"],
            ),
        ),
        256,
    )


def lineage_digest(df: DataFrame, url_col: str, text_col: str,
                   bucket_col: str) -> DataFrame:
    """The queryable form of the audit row commit() writes: per bucket,
    (bucket, doc_count, url_min, url_max, content_sha256). Verifying a
    snapshot against its audit is one run of this over the data files.

    Shape: one hash agg keyed on the bucket; the agg buffer holds
    (url, 32-byte hash) pairs — text itself never enters the buffer, so a
    bucket's state is bounded by its doc count times ~100 bytes, the same
    bound the commit path relies on."""
    return (
        df.groupBy(F.col(bucket_col).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("doc_count"),
            F.min(url_col).alias("url_min"),
            F.max(url_col).alias("url_max"),
            content_digest(url_col, text_col).alias("content_sha256"),
        )
    )


class SnapshotTable:
    def __init__(self, path: str, n_buckets: int = DEFAULT_BUCKETS):
        self.path = path
        self.n_buckets = n_buckets
        self.data_dir = os.path.join(path, "data")
        self.manifest_dir = os.path.join(path, "_manifest")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- snapshot bookkeeping -------------------------------------------------

    def _current_pointer(self) -> str:
        return os.path.join(self.manifest_dir, "current")

    def current_snapshot(self) -> dict:
        ptr = self._current_pointer()
        if not os.path.exists(ptr):
            return {"snapshot_id": 0, "data_files": [], "audit": [], "metrics": {}}
        with open(ptr) as f:
            snap_name = f.read().strip()
        with open(os.path.join(self.manifest_dir, snap_name)) as f:
            return json.load(f)

    def snapshot(self, snapshot_id: int) -> dict:
        """Time travel: load a specific committed snapshot (Iceberg
        ``VERSION AS OF`` analog). Snapshots are immutable JSON manifests, so
        any historical state stays readable until expired."""
        path = os.path.join(self.manifest_dir, f"snapshot-{snapshot_id:06d}.json")
        with open(path) as f:
            return json.load(f)

    def read_at(self, spark: SparkSession, snapshot_id: int) -> DataFrame | None:
        """Read the table AS OF a snapshot id — only the data files that
        snapshot referenced."""
        files = self.snapshot(snapshot_id)["data_files"]
        if not files:
            return None
        return spark.read.parquet(*[os.path.join(self.path, f) for f in files])

    def committed_partitions(self) -> list[int]:
        return sorted({a["partition_id"] for a in self.current_snapshot()["audit"]})

    def audit_rows(self) -> list[dict]:
        return self.current_snapshot()["audit"]

    def read(self, spark: SparkSession) -> DataFrame | None:
        files = self.current_snapshot()["data_files"]
        if not files:
            return None
        return spark.read.parquet(*[os.path.join(self.path, f) for f in files])

    # -- bounded resume metadata (O(audit), no data scan) ---------------------

    def last_batch_id(self, checkpoint: str) -> int | None:
        """Highest committed streaming batch_id for a checkpoint lineage, from
        snapshot metrics alone. Scoped to the checkpoint: a NEW checkpoint
        restarts batch ids at 0, so its batches must not be confused with an
        old lineage's."""
        best = None
        for m in self.current_snapshot().get("metrics", {}).values():
            if m.get("checkpoint") == checkpoint and "batch_id" in m:
                b = int(m["batch_id"])
                best = b if best is None else max(best, b)
        return best

    @staticmethod
    def _run_of(rel_file: str) -> str:
        # data files live under data/run-<id>/part-*.parquet; audit rows
        # carry the bare <id>
        parts = rel_file.replace("\\", "/").split("/")
        return parts[1].removeprefix("run-") if len(parts) > 1 else ""

    def candidate_committed_files(
        self, buckets: set[int], url_lo: str, url_hi: str
    ) -> list[str]:
        """Data files that COULD contain already-committed rows for the given
        bucket set and url bounds — decided entirely from the per-run audit
        rows (partition_id + [url_min, url_max] per bucket), i.e. O(audit)
        metadata work. Runs whose committed url ranges are disjoint from the
        probe bounds are pruned wholesale; only overlapping runs' files need
        a (column-pruned, predicate-pushed) scan."""
        snap = self.current_snapshot()
        runs = {
            a["run_id"]
            for a in snap["audit"]
            if a["partition_id"] in buckets
            and not (a["url_max"] < url_lo or a["url_min"] > url_hi)
        }
        return [f for f in snap["data_files"] if self._run_of(f) in runs]

    # -- commit path ----------------------------------------------------------

    def filter_uncommitted(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        """Idempotent-resume anti-join: drop rows in already-committed buckets.

        The committed side is a tiny in-manifest list, so it arrives as a
        broadcast literal `isin` — no shuffle, prunes before any compute."""
        df = df.withColumn("part_key", part_key(F.col(url_col), self.n_buckets))
        done = self.committed_partitions()
        if done:
            df = df.filter(~F.col("part_key").isin(done))
        return df

    def commit(
        self,
        df: DataFrame,
        text_col: str = "extracted_text",
        url_col: str = "url",
        metrics: dict | None = None,
    ) -> list[dict]:
        """Write df (must carry part_key) as a new snapshot; returns the new
        audit rows. Data lands in an immutable run directory first; the
        manifest pointer flips last (atomic rename)."""
        run_id = uuid.uuid4().hex[:12]
        rel_run_dir = os.path.join("data", f"run-{run_id}")
        run_dir = os.path.join(self.path, rel_run_dir)

        df = df.persist()
        try:
            df.write.mode("overwrite").parquet(run_dir)

            # Per-partition lineage: url range, count, and an order-stable
            # content hash (sha256 over url-sorted per-url text sha256s).
            audit_df = (
                df.groupBy("part_key")
                .agg(
                    F.min(url_col).alias("url_min"),
                    F.max(url_col).alias("url_max"),
                    F.count(F.lit(1)).alias("doc_count"),
                    content_digest(url_col, text_col).alias("content_sha256"),
                )
                .collect()
            )
        finally:
            df.unpersist()

        new_files = [
            os.path.join(rel_run_dir, f)
            for f in sorted(os.listdir(run_dir))
            if f.endswith(".parquet")
        ]
        prev = self.current_snapshot()
        new_audit = prev["audit"] + [
            {
                "partition_id": int(r["part_key"]),
                "url_min": r["url_min"],
                "url_max": r["url_max"],
                "doc_count": int(r["doc_count"]),
                "content_sha256": r["content_sha256"],
                "run_id": run_id,
            }
            for r in sorted(audit_df, key=lambda r: int(r["part_key"]))
        ]
        snap = {
            "snapshot_id": prev["snapshot_id"] + 1,
            "parent_id": prev["snapshot_id"],
            "data_files": prev["data_files"] + new_files,
            "audit": new_audit,
            "metrics": {**prev.get("metrics", {}), run_id: (metrics or {})},
            "committed_at": time.time(),
        }
        snap_name = f"snapshot-{snap['snapshot_id']:06d}.json"
        snap_path = os.path.join(self.manifest_dir, snap_name)
        tmp = snap_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, snap_path)

        ptr_tmp = self._current_pointer() + ".tmp"
        with open(ptr_tmp, "w") as f:
            f.write(snap_name)
            f.flush()
            os.fsync(f.fileno())
        os.rename(ptr_tmp, self._current_pointer())  # the atomic commit point
        return new_audit


def run_and_commit(
    spark: SparkSession,
    pages_path: str,
    out_table: SnapshotTable,
    payloads_path: str | None = None,
    limit_partitions: int | None = None,
) -> dict:
    """Full job: read -> resume-filter -> pipeline -> commit. Returns metrics.

    limit_partitions processes only the first N uncommitted buckets — used by
    tests to simulate a killed run and prove idempotent resume."""
    from ocr_spark.pipeline import run_pipeline

    t0 = time.time()
    pages = spark.read.parquet(pages_path)
    pages = out_table.filter_uncommitted(pages)
    if limit_partitions is not None:
        remaining = [
            p for p in range(out_table.n_buckets)
            if p not in set(out_table.committed_partitions())
        ][:limit_partitions]
        pages = pages.filter(F.col("part_key").isin(remaining))
    result = run_pipeline(spark, pages_path=None, pages_df=pages, payloads_path=payloads_path)
    result = result.withColumn("part_key", part_key(F.col("url"), out_table.n_buckets))
    n_before = len(out_table.committed_partitions())
    docs_before = sum(a["doc_count"] for a in out_table.audit_rows())
    audit = out_table.commit(result, metrics={"elapsed_sec": time.time() - t0})
    return {
        "elapsed_sec": time.time() - t0,
        "partitions_before": n_before,
        "partitions_after": len(out_table.committed_partitions()),
        # docs committed BY THIS RUN (0 on an idempotent no-op resume) —
        # audit[-1].run_id belongs to the last run that wrote rows, which
        # is a PRIOR run when this one had nothing left to do.
        "docs_committed": sum(a["doc_count"] for a in audit) - docs_before,
    }
