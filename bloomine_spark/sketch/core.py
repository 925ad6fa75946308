"""Distributed mergeable-sketch aggregation (the UDAF framework).

Design (SURVEY.md §7 step 5): a sketch aggregation is two physical stages —

1. **partials** — a shuffle-free ``mapInPandas`` pass that folds every
   partition into one tiny binary sketch state per (partition × group):
   the map-side combine. This is where all the data volume dies; what
   shuffles afterwards is O(partitions × groups × state_size) bytes,
   independent of row count — the property that makes this viable at
   10^12 rows.
2. **merge** — grouped: ``groupBy(keys).applyInPandas`` (each group merges
   its ≤P small states); global: a fan-in **tree reduce** implemented as
   repeated bucketed merges, so no single task ever folds more than
   ``fanin`` states (the distributed analog of the reference's
   futures-collection loop, /root/reference/src/BlooMineUtils.cpp:275-280,
   which is O(P) on one thread — ours is O(log_fanin P) rounds).

Sketch value objects only need: ``update_values(np.ndarray)``,
``merge(other)``, ``to_bytes()``, classmethod ``from_bytes``.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STATE_COL = "sketch_state"


def _values_of(pdf_col: pd.Series) -> np.ndarray:
    """Extract a flat numpy value array from a batch column.

    Array columns (e.g. ``tokens``) are flattened; scalar columns pass
    through. All-vectorized.
    """
    if len(pdf_col) == 0:
        return np.empty(0, dtype=np.int64)
    first = pdf_col.iloc[0]
    if isinstance(first, (np.ndarray, list)):
        parts = [np.asarray(a) for a in pdf_col.to_numpy() if len(a)]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.concatenate(parts)
    return pdf_col.to_numpy()


class CompositeSketch:
    """Several mergeable sketches folded in ONE pass over the input.

    Different summaries of the same corpus (e.g. CMS frequencies + MG heavy
    hitters) are each one-pass mergeable folds — running them as separate
    ``sketch_agg_global`` calls scans the corpus once per sketch. A
    composite updates every member per batch, so the scan cost is paid
    once and the members still merge independently. Serialization embeds
    each member's ``module:qualname`` so ``from_bytes`` reconstructs the
    members on any executor (all sketch classes ship in the addPyFile zip).
    """

    MAGIC = b"CMP1"

    def __init__(self, sketches):
        self.sketches = list(sketches)

    def update_values(self, values: np.ndarray) -> None:
        for s in self.sketches:
            s.update_values(values)

    def merge(self, other: "CompositeSketch") -> None:
        if len(other.sketches) != len(self.sketches):
            raise ValueError(
                f"composite arity mismatch: {len(self.sketches)} vs "
                f"{len(other.sketches)}"
            )
        for a, b in zip(self.sketches, other.sketches):
            a.merge(b)

    def to_bytes(self) -> bytes:
        import struct

        parts = [self.MAGIC, struct.pack("<I", len(self.sketches))]
        for s in self.sketches:
            name = f"{type(s).__module__}:{type(s).__qualname__}".encode()
            blob = s.to_bytes()
            parts += [
                struct.pack("<I", len(name)), name,
                struct.pack("<Q", len(blob)), blob,
            ]
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CompositeSketch":
        import importlib
        import struct

        if blob[:4] != cls.MAGIC:
            raise ValueError("not a CompositeSketch blob")
        off = 4
        (n,) = struct.unpack_from("<I", blob, off)
        off += 4
        members = []
        for _ in range(n):
            (ln,) = struct.unpack_from("<I", blob, off)
            off += 4
            mod, _, qual = blob[off : off + ln].decode().partition(":")
            off += ln
            (lb,) = struct.unpack_from("<Q", blob, off)
            off += 8
            # walk dotted qualnames so nested classes (qualname
            # "Outer.Inner") deserialize on executors too
            member_cls = importlib.import_module(mod)
            for part in qual.split("."):
                member_cls = getattr(member_cls, part)
            members.append(member_cls.from_bytes(blob[off : off + lb]))
            off += lb
        return cls(members)


def sketch_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    factory: Callable[[], "object"],
) -> DataFrame:
    """Stage 1: one sketch state per (partition, group). Shuffle-free.

    The global (ungrouped) path runs as ``mapInArrow``: a list column's
    Arrow layout IS the flat-values+offsets form the kernels want, so the
    fold touches the token buffer zero-copy — no per-row ndarray
    materialization at all.
    """
    out_fields = [df.schema[c] for c in group_cols] + [
        T.StructField(STATE_COL, T.BinaryType())
    ]
    schema = T.StructType(out_fields)

    if not group_cols:
        import pyarrow as pa

        from bloomine_spark.functions.kgrams import raw_list_values

        is_array = isinstance(df.schema[value_col].dataType, T.ArrayType)

        def fold_arrow(batches):
            sk = factory()
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                if is_array:
                    # native-dtype zero-copy: the update kernels widen
                    # per cache-sized chunk in their scratch buffers, so
                    # a full-batch int32→u64 pass here would only add
                    # memory traffic
                    sk.update_values(raw_list_values(rb, value_col))
                else:
                    sk.update_values(
                        rb.column(rb.schema.get_field_index(value_col))
                        .to_numpy(zero_copy_only=False)
                    )
            # empty partitions yield an empty sketch — harmless to merge
            yield pa.RecordBatch.from_pydict(
                {STATE_COL: pa.array([sk.to_bytes()], type=pa.binary())}
            )

        return df.mapInArrow(fold_arrow, schema=schema)

    if len(group_cols) == 1:
        # single-key grouped fold, also Arrow-native: group rows with one
        # np.unique, slice the flat token buffer per group via a stable
        # sort on per-position group ids — no pandas groupby machinery
        import pyarrow as pa

        from bloomine_spark.functions.kgrams import token_batch_from_arrow

        gcol = group_cols[0]
        is_array = isinstance(df.schema[value_col].dataType, T.ArrayType)

        def fold_arrow_grouped(batches):
            acc: dict = {}
            gtype = None
            for rb in batches:
                if rb.num_rows == 0:
                    continue
                garr = rb.column(rb.schema.get_field_index(gcol))
                if gtype is None:
                    gtype = garr.type
                g = garr.to_numpy(zero_copy_only=False)
                keys, inv = np.unique(g, return_inverse=True)
                if is_array:
                    tb = token_batch_from_arrow(rb, value_col)
                    pos_group = np.repeat(inv, tb.lens)
                    vals_all = tb.flat
                else:
                    pos_group = inv
                    vals_all = rb.column(
                        rb.schema.get_field_index(value_col)
                    ).to_numpy(zero_copy_only=False)
                order = np.argsort(pos_group, kind="stable")
                sorted_vals = vals_all[order]
                sorted_groups = pos_group[order]
                bounds = np.searchsorted(
                    sorted_groups, np.arange(len(keys) + 1)
                )
                for gi, key in enumerate(keys):
                    if key not in acc:
                        acc[key] = factory()
                    acc[key].update_values(sorted_vals[bounds[gi]:bounds[gi + 1]])
            if acc:
                keys = sorted(acc.keys())
                yield pa.RecordBatch.from_pydict(
                    {
                        gcol: pa.array(list(keys), type=gtype),
                        STATE_COL: pa.array(
                            [acc[k].to_bytes() for k in keys], type=pa.binary()
                        ),
                    }
                )

        return df.mapInArrow(fold_arrow_grouped, schema=schema)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, object] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if group_cols:
                for key, sub in pdf.groupby(group_cols, sort=False):
                    if not isinstance(key, tuple):
                        key = (key,)
                    sk = acc.get(key)
                    if sk is None:
                        sk = acc[key] = factory()
                    sk.update_values(_values_of(sub[value_col]))
            else:
                sk = acc.get(())
                if sk is None:
                    sk = acc[()] = factory()
                sk.update_values(_values_of(pdf[value_col]))
        if acc:
            keys = list(acc.keys())
            data = {c: [k[i] for k in keys] for i, c in enumerate(group_cols)}
            data[STATE_COL] = [acc[k].to_bytes() for k in keys]
            yield pd.DataFrame(data)

    return df.mapInPandas(fold, schema=schema)


def _merge_states(states: list[bytes], factory) -> bytes:
    cls = type(factory())
    it = iter(states)
    merged = cls.from_bytes(next(it))
    for s in it:
        merged.merge(cls.from_bytes(s))
    return merged.to_bytes()


def merge_grouped(
    partials: DataFrame, group_cols: list[str], factory
) -> DataFrame:
    """Stage 2 (grouped): merge each group's partial states into one."""
    schema = T.StructType(
        [partials.schema[c] for c in group_cols]
        + [T.StructField(STATE_COL, T.BinaryType())]
    )

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {c: [pdf[c].iloc[0]] for c in group_cols}
        out[STATE_COL] = [_merge_states(list(pdf[STATE_COL]), factory)]
        return pd.DataFrame(out)

    return partials.groupBy(*group_cols).applyInPandas(merge_fn, schema=schema)


def tree_merge_global(
    partials: DataFrame, factory, fanin: int = 64
) -> bytes:
    """Stage 2 (global): fan-in tree reduce of all partial states.

    Rounds of bucketed merges — each round shrinks the state count by
    ``fanin``× and no task merges more than ``fanin`` states, keeping both
    task memory and driver work bounded at any partition count.
    """
    spark = partials.sparkSession
    schema = T.StructType(
        [T.StructField("bucket", T.LongType()), T.StructField(STATE_COL, T.BinaryType())]
    )

    def merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": [pdf["bucket"].iloc[0] // fanin],
                STATE_COL: [_merge_states(list(pdf[STATE_COL]), factory)],
            }
        )

    # materialize the (tiny) partials once — every downstream action below
    # must NOT recompute the full input scan
    partials = partials.persist()
    n = partials.count()
    if n <= fanin:
        # common case (P ≤ fanin): one driver-side fold, no extra stages
        states = [bytes(r[STATE_COL]) for r in partials.select(STATE_COL).collect()]
        partials.unpersist()
        if not states:
            return factory().to_bytes()
        return _merge_states(states, factory)
    # contiguous bucket ids → balanced fan-in tree
    indexed = partials.select(STATE_COL).rdd.zipWithIndex()
    cur = spark.createDataFrame(
        indexed.map(lambda t: (t[1] // fanin, bytes(t[0][STATE_COL]))), schema
    )
    while n > fanin:
        cur = cur.groupBy("bucket").applyInPandas(merge_bucket, schema=schema)
        n = (n + fanin - 1) // fanin
    states = [r[STATE_COL] for r in cur.collect()]
    partials.unpersist()
    if not states:
        return factory().to_bytes()
    return _merge_states(states, factory)


def sketch_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    factory: Callable[[], object],
) -> DataFrame:
    """Grouped sketch aggregation → DataFrame[group_cols..., sketch_state]."""
    partials = sketch_partials(df, group_cols, value_col, factory)
    return merge_grouped(partials, group_cols, factory)


def sketch_agg_global(
    df: DataFrame, value_col: str, factory, fanin: int = 64
):
    """Global (ungrouped) sketch aggregation → merged sketch object."""
    partials = sketch_partials(df, [], value_col, factory)
    blob = tree_merge_global(partials, factory, fanin=fanin)
    return type(factory()).from_bytes(blob)


def estimates_df(
    sketches: DataFrame,
    factory,
    estimator: Callable[[object], float],
    out_col: str = "estimate",
) -> DataFrame:
    """Map a state column to a numeric estimate column (Arrow-batched)."""
    cls = type(factory())

    @F.pandas_udf(T.DoubleType())
    def est(states: pd.Series) -> pd.Series:
        return states.apply(lambda b: float(estimator(cls.from_bytes(b))))

    return sketches.withColumn(out_col, est(F.col(STATE_COL)))
