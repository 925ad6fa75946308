"""Small-file compaction: plan audit + rewrite."""

import pandas as pd
import pytest

from bloomine_spark.operators.maintenance import (
    compact_parquet,
    compaction_plan,
    list_data_files,
)


def _fragmented(spark, tmp_path, n_files=40, rows_per=50):
    path = str(tmp_path / "frag")
    df = spark.range(n_files * rows_per).selectExpr(
        "id", "concat('payload for row ', id) as body"
    )
    df.repartition(n_files).write.parquet(path)
    return path


def test_plan_counts_and_ffd_bins(spark, tmp_path):
    path = _fragmented(spark, tmp_path)
    files = list_data_files(spark, path)
    assert len(files) == 40
    one = files[0][1]
    # target ~ 8 small files per bin
    plan = compaction_plan(spark, path, target_bytes=one * 8 + 64)
    assert plan["n_files"] == 40
    assert plan["n_small"] == 40
    # FFD: every bin except possibly the last holds several files, and
    # no bin exceeds the target
    sizes = {f: s for f, s in files}
    for b in plan["bins"]:
        assert sum(sizes[f] for f in b) <= one * 8 + 64
    assert plan["n_bins"] <= 6  # 40 files / ~8 per bin
    # every file lands in exactly one bin
    flat = [f for b in plan["bins"] for f in b]
    assert sorted(flat) == sorted(sizes)


def test_plan_large_files_sit_alone(spark, tmp_path):
    path = _fragmented(spark, tmp_path, n_files=4)
    one = list_data_files(spark, path)[0][1]
    plan = compaction_plan(spark, path, target_bytes=one // 2)
    assert plan["n_bins"] == 4
    assert all(len(b) == 1 for b in plan["bins"])
    assert plan["n_small"] == 0


def test_compact_preserves_rows(spark, tmp_path):
    path = _fragmented(spark, tmp_path)
    out = str(tmp_path / "compacted")
    one = list_data_files(spark, path)[0][1]
    stats = compact_parquet(spark, path, out, target_bytes=one * 10)
    assert stats["n_out_files"] < stats["n_files"]
    got = spark.read.parquet(out).orderBy("id").toPandas()
    want = spark.read.parquet(path).orderBy("id").toPandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


def test_compact_validates(spark, tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError, match="no data files"):
        compact_parquet(spark, str(tmp_path / "empty"),
                        str(tmp_path / "o"))
    with pytest.raises(ValueError, match="target_bytes"):
        compaction_plan(spark, str(tmp_path / "empty"), target_bytes=0)


def test_hidden_directory_members_excluded(spark, tmp_path):
    # review finding: _spark_metadata/ members are named '0', '9.compact'
    # — hidden-ness must apply to every path component
    import os

    path = _fragmented(spark, tmp_path, n_files=3)
    meta = os.path.join(path, "_spark_metadata")
    os.makedirs(meta)
    for name in ("0", "1", "9.compact"):
        with open(os.path.join(meta, name), "w") as fh:
            fh.write("not data")
    files = list_data_files(spark, path)
    assert len(files) == 3
    assert all("_spark_metadata" not in f for f, _ in files)
