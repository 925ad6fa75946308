"""Live Iceberg-catalog test — self-activating.

The sandbox ships no Iceberg runtime jar, so this module SKIPS there (the
documented boundary, sources/iceberg.py). On any environment where
``iceberg-spark-runtime`` is on the Spark classpath, the skip lifts and
the test exercises the REAL path: create a local Hadoop-catalog table,
write the sequences schema through ``write_sequences``, read it back via
``spark.table`` through ``load_sequences``, and run the two-phase screen
over it.
"""

import glob
import os

import numpy as np
import pandas as pd
import pytest


def _iceberg_jar_present() -> bool:
    try:
        import pyspark

        jars = glob.glob(
            os.path.join(os.path.dirname(pyspark.__file__), "jars", "*iceberg*")
        )
        return bool(jars)
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _iceberg_jar_present(),
    reason="iceberg-spark-runtime jar not on the classpath "
    "(documented boundary — sources/iceberg.py)",
)


def test_iceberg_hadoop_catalog_roundtrip_and_screen(tmp_path):
    from pyspark.sql import SparkSession

    from bloomine_spark.datagen import DEFAULT_TARGET, generate_rows
    from bloomine_spark.operators.screen import screen_hits
    from bloomine_spark.sources.iceberg import load_sequences, write_sequences

    wh = str(tmp_path / "warehouse")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-live")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions."
            "IcebergSparkSessionExtensions",
        )
        .config(
            "spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config("spark.sql.catalog.lake.type", "hadoop")
        .config("spark.sql.catalog.lake.warehouse", f"file://{wh}")
        .getOrCreate()
    )
    try:
        pdf = generate_rows(np.arange(2000), seed=11)
        df = spark.createDataFrame(pd.DataFrame(pdf))
        spark.sql("CREATE NAMESPACE IF NOT EXISTS lake.db")
        write_sequences(df, "lake.db.sequences", mode="overwrite")
        back = load_sequences(spark, "lake.db.sequences")
        assert back.count() == 2000
        hits = screen_hits(back, DEFAULT_TARGET)
        assert hits.count() > 0
        # snapshot isolation surface: the table has a snapshot log
        snaps = spark.sql(
            "SELECT snapshot_id FROM lake.db.sequences.snapshots"
        ).count()
        assert snaps >= 1
    finally:
        spark.stop()
