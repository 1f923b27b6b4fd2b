"""Snapshot-versioned parquet tables: MERGE/upsert, time travel, and
compaction on plain parquet — the minimal lakehouse-table surface an
incrementally-maintained corpus needs, with no table-format dependency.

Layout: ``<root>/v=N/`` parquet snapshot per version. Writers always
produce a NEW version directory (immutable snapshots → readers never see
partial writes, old versions stay queryable for reproducibility/time
travel); a marker file ``<root>/_latest`` names the committed version, and
is written only after the snapshot directory is complete — a reader
following the marker can never observe a half-written snapshot.

Scale notes: MERGE is one full-outer join keyed on the merge key (sort-
merge at scale; the updates side is typically ≪ target and AQE broadcasts
it), and the rewrite cost is one full-table pass — the same cost contract
as Delta/Iceberg copy-on-write. Partition-level rewrite (only touched
partitions) is the documented next tier: partition the snapshot dirs and
join only affected partitions.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def snapshot_versions(root: str) -> list[int]:
    """Committed + uncommitted version numbers present on disk, sorted."""
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        m = re.fullmatch(r"v=(\d+)", d)
        if m and os.path.isdir(os.path.join(root, d)):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(root: str) -> int | None:
    """The committed latest version (from the ``_latest`` marker; falls
    back to the highest on-disk version for pre-marker layouts)."""
    marker = os.path.join(root, "_latest")
    if os.path.isfile(marker):
        with open(marker) as fh:
            return int(fh.read().strip())
    versions = snapshot_versions(root)
    return versions[-1] if versions else None


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a table snapshot — latest committed by default, or any
    historical ``version`` (time travel)."""
    v = latest_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots under {root}")
    return spark.read.parquet(os.path.join(root, f"v={v}"))


def _commit(df: DataFrame, root: str, version: int, n_files: int | None) -> int:
    if n_files is not None:
        df = df.repartition(n_files)
    df.write.mode("errorifexists").parquet(os.path.join(root, f"v={version}"))
    tmp = os.path.join(root, "_latest.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(root, "_latest"))  # atomic marker flip
    return version


def create_snapshot(df: DataFrame, root: str, n_files: int | None = None) -> int:
    """Create version 0 (or the next version) from a full DataFrame."""
    os.makedirs(root, exist_ok=True)
    versions = snapshot_versions(root)
    v = (versions[-1] + 1) if versions else 0
    return _commit(df, root, v, n_files)


def merge_upsert(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key: str,
    delete_col: str | None = None,
    n_files: int | None = None,
) -> int:
    """MERGE INTO, copy-on-write: rows in ``updates`` replace same-key
    target rows (when matched → update), new keys insert (when not matched
    → insert), and — when ``delete_col`` names a boolean column — update
    rows flagged true DELETE their key instead. Commits and returns a new
    immutable version.

    Semantics contract (pinned in tests): exactly SQL's
    ``MERGE INTO t USING u ON t.key = u.key
    WHEN MATCHED AND u.del THEN DELETE
    WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED AND NOT u.del THEN
    INSERT *``. ``updates`` must carry the full target schema (plus the
    optional flag); one row per key."""
    target = read_snapshot(spark, root)
    data_cols = [c for c in target.columns]
    if delete_col is not None:
        dels = updates.filter(F.col(delete_col)).select(key)
        ups = updates.filter(~F.col(delete_col)).select(*data_cols)
    else:
        dels = None
        ups = updates.select(*data_cols)
    kept = target.join(ups.select(key), key, "left_anti")
    if dels is not None:
        kept = kept.join(dels, key, "left_anti")
    merged = kept.unionByName(ups)
    v = snapshot_versions(root)[-1] + 1
    return _commit(merged, root, v, n_files)


def compact_snapshot(
    spark: SparkSession, root: str, n_files: int = 8
) -> int:
    """Small-file compaction: rewrite the latest snapshot into ``n_files``
    right-sized files as a new version — same rows, fewer tasks and
    footers for every later scan (the maintenance pass that keeps a
    frequently-upserted table scannable)."""
    cur = read_snapshot(spark, root)
    v = snapshot_versions(root)[-1] + 1
    return _commit(cur, root, v, n_files)
