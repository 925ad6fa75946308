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


def _row_header(r, seed, vocab, min_len, max_len, n_sources, skew_pct):
    lens = (min_len + (_h(seed, r, 1) % np.uint64(max_len - min_len))).astype(
        np.int64
    )
    cat = (_h(seed, r, 2) % np.uint64(100)).astype(np.int64)
    skew_roll = (_h(seed, r, 3) % np.uint64(100)).astype(np.int64)
    src_pick = (_h(seed, r, 4) % np.uint64(n_sources - 1)).astype(np.int64) + 1
    sources = np.where(skew_roll < skew_pct, 0, src_pick)
    return lens, cat, sources


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
    """Generate the rows for a set of row ids (pure function of ids+seed).

    Fully vectorized: one flat token buffer for the whole id set, category
    planting via fancy indexing. Byte-identical to the per-row reference
    implementation below (equality-tested)."""
    target_arr = np.asarray(target if target is not None else DEFAULT_TARGET,
                            dtype=np.int64)
    tlen = len(target_arr)
    r = np.asarray(row_ids, dtype=np.int64)
    n = len(r)
    lens, cat, sources = _row_header(
        r, seed, vocab, min_len, max_len, n_sources, skew_pct
    )

    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    total = int(lens.sum()) if n else 0

    # base background tokens for ALL rows in one pass:
    # tok(rid, j) = splitmix64(j + mix(rid)) % vocab
    pos_in_row = np.arange(total, dtype=np.int64) - np.repeat(offsets, lens)
    mixes = (
        r.astype(np.uint64) * np.uint64(0xD6E8FEB86659FD93)
        + np.uint64((seed * 0x8A5CD789635D2DFF) % (1 << 64))
    )
    flat = (
        splitmix64(pos_in_row.astype(np.uint64) + np.repeat(mixes, lens),
                   inplace=True)
        % np.uint64(vocab)
    ).astype(np.int32)

    eligible = lens >= tlen + 2
    at = (_h(seed, r, 5) % np.maximum(lens - tlen, 1).astype(np.uint64)).astype(
        np.int64
    )
    span = np.arange(tlen, dtype=np.int64)

    def plant(sel: np.ndarray, pattern: np.ndarray, start: np.ndarray,
              length: int) -> None:
        if not sel.any():
            return
        idx = (offsets[sel] + start[sel])[:, None] + span[None, :length]
        flat[idx] = pattern[None, :length].astype(np.int32)

    zero = np.zeros(n, dtype=np.int64)
    half = tlen // 2
    plant(eligible & (cat < 6), target_arr, at, tlen)                 # (a)
    sel_b = eligible & (cat >= 6) & (cat < 12)                        # (b)
    plant(sel_b, target_arr, at, tlen)
    if sel_b.any():
        err_pos = offsets[sel_b] + at[sel_b] + half
        flat[err_pos] = ((flat[err_pos].astype(np.int64) + 1) % vocab).astype(
            np.int32
        )
    sel_c = eligible & (cat >= 12) & (cat < 16)                       # (c)
    plant(sel_c, target_arr[:half], zero, half)
    plant(sel_c, target_arr[half:], lens - half, tlen - half)
    plant(eligible & (cat >= 16) & (cat < 21), target_arr[::-1], at, tlen)  # (d)
    sel_f = eligible & (cat >= 21) & (cat < 24)                       # (f)
    if sel_f.any():
        fpos = np.repeat(sel_f, lens)
        flat[fpos] = target_arr[: 4][(pos_in_row[fpos] % 4)].astype(np.int32)

    tokens_out = np.split(flat, offsets[1:]) if n else []
    return pd.DataFrame(
        {
            "doc_id": [f"d{int(x):010d}" for x in r],
            "tokens": tokens_out,
            "n_tok": lens.astype(np.int32),
            "source": [f"src{int(s)}" for s in sources],
        }
    )


def generate_rows_reference(
    row_ids: np.ndarray,
    seed: int = 42,
    vocab: int = 256,
    min_len: int = 64,
    max_len: int = 384,
    target: list[int] | None = None,
    n_sources: int = 10,
    skew_pct: int = 50,
) -> pd.DataFrame:
    """Per-row reference implementation (kept for the equality test)."""
    target_arr = np.asarray(target if target is not None else DEFAULT_TARGET,
                            dtype=np.int64)
    tlen = len(target_arr)
    r = np.asarray(row_ids, dtype=np.int64)
    n = len(r)
    lens, cat, sources = _row_header(
        r, seed, vocab, min_len, max_len, n_sources, skew_pct
    )

    tokens_out: list[np.ndarray] = []
    for i in range(n):
        rid = int(r[i])
        ln = int(lens[i])
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
            elif c < 16:  # (c) two distant halves: FP passes, SP fails
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
