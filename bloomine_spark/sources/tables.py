"""Parquet table loaders + the tokenized ``sequences`` view over documents.

The driver testdata (TESTDATA.md) has no pre-tokenized table, so we derive
one from ``documents`` with a pure-Spark expression: whitespace-split words
hashed to int32 token ids via ``xxhash64`` (collision-free on the tiny
corpus vocabulary; asserted in tests). Patterns are tokenized with the SAME
expression so engine-side token matching is equivalent to string-phrase
containment — which is what makes the DuckDB oracle SQL for the screen
queries expressible as ``LIKE`` with space padding.

At production scale the input is an Iceberg table already shaped
``(doc_id, tokens, n_tok, source)`` (BASELINE.json:input_hint) and this
module is just ``spark.table(...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_TOKEN_MOD = 2147483647  # keep ids in int32 range


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def _tok_expr(words_col):
    return F.transform(
        words_col,
        lambda w: F.pmod(F.xxhash64(w), F.lit(_TOKEN_MOD)).cast("int"),
    )


def tokenize_documents(docs: DataFrame) -> DataFrame:
    """documents(doc_id,text,lang,source,n_chars) → sequences view.

    Pure built-in expressions (split/transform/xxhash64) — stays inside
    whole-stage codegen, no Python.
    """
    words = F.split(F.col("text"), " ")
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        _tok_expr(words).alias("tokens"),
        F.size(words).cast("int").alias("n_tok"),
        F.col("source"),
    )


def tokenize_phrase(spark: SparkSession, phrase: str) -> list[int]:
    """Tokenize a pattern with the same expression as tokenize_documents."""
    row = (
        spark.range(1)
        .select(_tok_expr(F.split(F.lit(phrase), " ")).alias("t"))
        .head()
    )
    return list(row["t"])
