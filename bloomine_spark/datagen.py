"""Deterministic synthetic ``sequences`` table generator.

Shape mandated by BASELINE.json:input_hint —
``(doc_id string, tokens array<int32>, n_tok int32, source string)`` — with
the planted-pattern composition of FIXTURES.md §1: exact occurrences,
lightly-mutated occurrences (pass SP), heavily-mutated (pass FP, fail SP),
reversed-only occurrences (RC retry path), low-complexity repeats, and
random background, plus a deliberately skewed source (src0 holds ~50% of
rows) to exercise salted repartitioning.

Generation is HASH-BASED, not RNG-stream-based: token (r, j) is a pure
function of (seed, row id r, position j), so any partitioning of the row-id
range yields byte-identical data — the property that makes the distributed
generator (mapInPandas over spark.range) and the local generator (tests)
provably produce the same table.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from bloomine_spark.functions.hashing import splitmix64

# the canonical 12-token period-4 target — token analog of the reference
# gtest fixture ACGTACGTACGT (/root/reference/src/UnitTests.cpp:12-27)
FIXTURE_TARGET = [1, 2, 3, 4, 1, 2, 3, 4, 1, 2, 3, 4]

# a 24-token high-complexity default target for screening workloads
DEFAULT_TARGET = [17, 91, 4, 203, 55, 128, 7, 66, 240, 12, 99, 180,
                  31, 77, 150, 2, 222, 45, 88, 101, 63, 5, 133, 27]

SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)


def _h(seed: int, r: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic per-row uint64 from (seed, row id, stream)."""
    mix = (stream * 0xA24BAED4963EE407 + seed * 0x9FB21C651E98DF25) % (1 << 64)
    return splitmix64(r.astype(np.uint64) + np.uint64(mix))


def generate_rows(
    row_ids: np.ndarray,
    seed: int = 42,
    vocab: int = 256,
    min_len: int = 64,
    max_len: int = 384,
    target: list[int] | None = None,
    n_sources: int = 10,
    skew_pct: int = 50,
) -> pd.DataFrame:
    """Generate the rows for a set of row ids (pure function of ids+seed)."""
    target_arr = np.asarray(target if target is not None else DEFAULT_TARGET,
                            dtype=np.int64)
    tlen = len(target_arr)
    r = np.asarray(row_ids, dtype=np.int64)
    n = len(r)

    lens = (min_len + (_h(seed, r, 1) % np.uint64(max_len - min_len))).astype(
        np.int64
    )
    cat = (_h(seed, r, 2) % np.uint64(100)).astype(np.int64)
    skew_roll = (_h(seed, r, 3) % np.uint64(100)).astype(np.int64)
    src_pick = (_h(seed, r, 4) % np.uint64(n_sources - 1)).astype(np.int64) + 1
    sources = np.where(skew_roll < skew_pct, 0, src_pick)

    tokens_out: list[np.ndarray] = []
    for i in range(n):
        rid = int(r[i])
        ln = int(lens[i])
        # base background tokens: hash of (seed, rid, 16+j)
        pos = np.arange(ln, dtype=np.uint64)
        mix = (rid * 0xD6E8FEB86659FD93 + seed * 0x8A5CD789635D2DFF) % (1 << 64)
        toks = (splitmix64(pos + np.uint64(mix)) % np.uint64(vocab)).astype(
            np.int64
        )

        c = int(cat[i])
        if ln >= tlen + 2:
            at = int(_h(seed, np.array([rid]), 5)[0] % np.uint64(ln - tlen))
            if c < 6:  # (a) exact occurrence
                toks[at : at + tlen] = target_arr
            elif c < 12:  # (b) one-token error — still passes scored SP
                toks[at : at + tlen] = target_arr
                toks[at + tlen // 2] = (toks[at + tlen // 2] + 1) % vocab
            elif c < 16:  # (c) two distant target halves: FP passes on the
                # combined distinct k-grams, but the max fragment scores
                # below MST → SP fail (exercises the split/concat scorer)
                half = tlen // 2
                toks[0:half] = target_arr[:half]
                toks[ln - half : ln] = target_arr[half:]
            elif c < 21:  # (d) reversed occurrence only — RC retry path
                toks[at : at + tlen] = target_arr[::-1]
            elif c < 24:  # (f) low-complexity repeat rows
                rep = np.tile(target_arr[:4], ln // 4 + 1)[:ln]
                toks = rep.astype(np.int64)
        tokens_out.append(toks.astype(np.int32))

    return pd.DataFrame(
        {
            "doc_id": [f"d{int(x):010d}" for x in r],
            "tokens": tokens_out,
            "n_tok": lens.astype(np.int32),
            "source": [f"src{int(s)}" for s in sources],
        }
    )


def generate_sequences(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    partitions: int = 64,
    **kwargs,
) -> DataFrame:
    """Distributed generator: mapInPandas over spark.range — scales to any
    n_rows without driver materialization, deterministic per row id."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield generate_rows(pdf["id"].to_numpy(), seed=seed, **kwargs)

    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInPandas(gen, schema=SEQUENCES_SCHEMA)
    )
