"""Table maintenance: small-file compaction — the housekeeping job
every streaming/incremental pipeline needs once sinks have written
thousands of per-trigger files (small files tax the NameNode/object
listing AND every scan's task-scheduling overhead; the fix is a
periodic rewrite at a target file size).

``compaction_plan`` is the audit half: list the table's data files and
first-fit-decreasing them into target-size bins — the report that
says HOW fragmented a table is and what a rewrite would produce (FFD
uses at most 11/9·OPT+1 bins, the classic bound). ``compact_parquet``
is the rewrite half: one read → repartition to ``ceil(total/target)``
→ atomic-ish write to a new location (parquet cannot concatenate
row groups in place, so compaction IS a rewrite — the plan's bins
inform the output count, not a byte-level merge).

Determinism note: the rewrite preserves ROWS exactly (pytest-gated)
but not row order or file assignment — like every Spark write.
"""

from __future__ import annotations

import math

__all__ = ["compaction_plan", "compact_parquet", "list_data_files"]


def list_data_files(spark, path: str) -> list[tuple[str, int]]:
    """(path, size_bytes) for every data file under ``path``, via the
    Hadoop FS API (works for local, HDFS and object stores alike);
    hidden/_metadata files are skipped."""
    sc = spark.sparkContext
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    base = fs.makeQualified(hpath).toString().rstrip("/")
    out = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        full = st.getPath().toString()
        # the Hadoop hidden convention applies to EVERY path component
        # under the table root, not just the leaf — otherwise a
        # streaming sink's _spark_metadata/ members ('0', '9.compact')
        # would count as data files (review finding)
        rel = full[len(base):].lstrip("/") if full.startswith(base) else full
        if any(p.startswith("_") or p.startswith(".")
               for p in rel.split("/")):
            continue
        out.append((full, int(st.getLen())))
    return out


def compaction_plan(
    spark, path: str, target_bytes: int = 128 * 1024 * 1024
) -> dict:
    """Fragmentation audit + first-fit-decreasing bin plan: returns
    ``{"n_files", "total_bytes", "n_small" (files under half target),
    "bins": [[file, ...], ...], "n_bins"}``. Files at or above the
    target sit alone in their bin (already compact — a rewrite would
    only burn IO)."""
    if target_bytes < 1:
        raise ValueError("target_bytes must be >= 1")
    files = sorted(
        list_data_files(spark, path), key=lambda p: (-p[1], p[0])
    )
    bins: list[list[str]] = []
    room: list[int] = []
    for f, sz in files:
        if sz >= target_bytes:
            bins.append([f])
            room.append(0)
            continue
        for i in range(len(bins)):
            if room[i] >= sz:
                bins[i].append(f)
                room[i] -= sz
                break
        else:
            bins.append([f])
            room.append(target_bytes - sz)
    total = sum(sz for _, sz in files)
    return {
        "n_files": len(files),
        "total_bytes": total,
        "n_small": sum(1 for _, sz in files if sz * 2 < target_bytes),
        "bins": bins,
        "n_bins": len(bins),
    }


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> dict:
    """Rewrite a fragmented parquet table at ``out_path`` with
    ``ceil(total_bytes / target_bytes)`` output files (parquet can't
    concatenate row groups, so compaction is a full rewrite — run it
    when :func:`compaction_plan` says the small-file count warrants
    the IO). Returns the plan stats plus ``n_out_files``. Writes to a
    NEW location: swapping it in atomically is the caller's rename
    (overwriting the input in place would lose the table on failure
    mid-write).

    A partitionBy-laid-out input loses its directory layout under the
    default flat rewrite (rows survive via partition-column inference,
    but partition pruning on the output does not) — pass
    ``partition_by`` to re-establish the layout on the output.
    """
    plan = compaction_plan(spark, in_path, target_bytes)
    if plan["n_files"] == 0:
        raise ValueError(f"no data files under {in_path!r}")
    n_out = max(1, math.ceil(plan["total_bytes"] / target_bytes))
    df = spark.read.parquet(in_path)
    writer = df.repartition(n_out).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_path)
    plan["n_out_files"] = len(list_data_files(spark, out_path))
    return plan
