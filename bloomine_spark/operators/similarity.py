"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline (per-partition partial
top-k, then a global window — the total shuffle is q·k·P rows, never n),
and an IVF (inverted-file) variant as the scale path: coarse-quantize
vectors to nlist centroids, probe only the nprobe nearest lists per query.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.linalg.norm(mat, axis=1, keepdims=True)


def brute_force_topk(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query vector (self excluded).

    Broadcast Q (q×d) → one matmul per Arrow batch → per-partition partial
    top-k → global top-k window. Shuffle volume: partitions × q × k rows.
    """
    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    bc = emb.sparkSession.sparkContext.broadcast((q_ids, q_mat))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            m = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            sims = qm @ m.T  # (q, batch)
            # mask self-matches
            self_mask = qi[:, None] == ids[None, :]
            sims[self_mask] = -np.inf
            kk = min(k, sims.shape[1])
            # deterministic partial top-k: order each query's candidates by
            # (cosine desc, neighbor_id asc) before truncating, so an
            # equal-cosine lower-id candidate at the k boundary is never
            # dropped ahead of the global tie-breaking window
            cols = np.empty((len(qi), kk), dtype=np.int64)
            for i in range(len(qi)):
                order = np.lexsort((ids, -sims[i]))
                cols[i] = order[:kk]
            rows = np.repeat(qi, kk)
            cols = cols.ravel()
            yield pd.DataFrame(
                {
                    "query_id": rows,
                    "neighbor_id": ids[cols],
                    "cosine": np.round(sims[np.repeat(np.arange(len(qi)), kk), cols], 6),
                }
            )

    partial = emb.mapInPandas(kernel, schema=_TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def train_ivf_centroids(
    emb: DataFrame,
    nlist: int = 16,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 5,
    vec_col: str = "embedding",
    fraction: float | None = None,
) -> np.ndarray:
    """Driver-side spherical k-means on a SEEDED DISTRIBUTED sample.

    ``limit(n)`` would take whatever rows the first partitions produce —
    at 100 TB that is one file's worth of possibly sorted/skewed data, and
    centroids trained on it misroute everything else. The content-hash
    filter below draws from every partition; the fraction derives from
    the table's row count (metadata-only for parquet — ONE pass over data
    total: the count is metadata, the sampled scan is the only full
    read), so the driver-side budget (``sample`` rows, configurable)
    holds at any scale. The ~20% oversample is trimmed DRIVER-side with
    the seeded rng — a cluster-side ``limit`` would take the first
    partitions' rows and re-introduce exactly the prefix bias the sample
    exists to avoid.

    Pass ``fraction`` to skip the metadata ``count()`` entirely when the
    caller already knows the table size (one job instead of two).

    The sample is PARTITIONING-INVARIANT: membership comes from a content
    hash of the vector (xxhash64 threshold), not Bernoulli-per-partition
    draws, and the collected matrix is content-ordered before the seeded
    k-means — so the same corpus trains the SAME centroids no matter how
    its files were split into partitions. (Seeded ``df.sample`` is only
    deterministic per partition INDEX; parquet split packing breaks size
    ties by file NAME, which carries a per-write UUID, so two reads of
    identical data can assign different partition ids and silently train
    different centroids — reproducible index builds need content-based
    sampling.)
    """
    n = None
    if fraction is None:
        n = emb.count()
        fraction = min(1.0, (sample * 1.2) / max(n, 1))
    frac = min(1.0, fraction)
    mod = 1 << 30
    pdf = (
        emb.select(vec_col)
        .filter(
            F.pmod(F.xxhash64(F.col(vec_col)) + F.lit(int(seed)), F.lit(mod))
            < F.lit(int(frac * mod))
        )
        .toPandas()
    )
    x = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
    if len(x) == 0:
        # degenerate: the hash threshold caught nothing. Only fall back to
        # a full collect when the table is provably SMALL — a caller who
        # passed a too-low explicit `fraction` on a big table should get an
        # error, not a driver OOM from collecting the whole table.
        n_rows = n if n is not None else emb.count()
        if n_rows > max(sample * 50, 100_000):
            raise ValueError(
                f"content-hash sample at fraction={frac:g} selected 0 of "
                f"{n_rows} rows; raise `fraction` (the full-table fallback "
                "is reserved for small tables)"
            )
        pdf = emb.select(vec_col).toPandas()
        x = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
    x = x[np.lexsort(x.T)]  # content order: collect-order invariant
    rng = np.random.default_rng(seed)
    if len(x) > sample:
        x = x[rng.choice(len(x), size=sample, replace=False)]
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        # cluster means via one unbuffered scatter-add: np.add.at
        # accumulates rows sequentially in original row order, which is
        # exactly np.mean(axis=0)'s reduction order, so every centroid
        # bit matches the old per-cluster boolean-mask loop (verified)
        # — without len(cent) full-sample mask scans per iteration
        sums = np.zeros_like(cent, shape=(len(cent), x.shape[1]))
        np.add.at(sums, assign, x)
        cnt = np.bincount(assign, minlength=len(cent))
        for c in np.flatnonzero(cnt):
            v = sums[c] / cnt[c]
            cent[c] = v / np.linalg.norm(v)
    return cent


def ivf_topk(
    emb: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    assign: int = 1,
) -> DataFrame:
    """IVF approximate top-k: scan only vectors whose coarse cell is among
    the query's nprobe nearest centroids (in-kernel mask over an arbitrary
    layout). At cluster scale use ``write_ivf_index`` +
    ``ivf_topk_indexed`` instead: the cell-partitioned layout turns the
    probe into REAL partition pruning, so unprobed cells are never read.

    ``assign`` is the recall dial that does NOT widen the probe: each
    vector belongs to its top-``assign`` cells (multi-assignment), so a
    true neighbor near a cell boundary is missed only if ALL of its cells
    go unprobed. Cosines inside probed cells are already exact, so
    boundary loss is the ONLY loss — on the driver fixture assign=3
    lifts recall@10 from 0.76 to 1.0 at the same nprobe/nlist=4/8 (half
    the cells still pruned); BENCH/ANN_SCALE.md holds ≥0.91 at 600k
    vectors under 81% pruning with assign=2. Index-side cost is a
    ×assign larger index (``write_ivf_index``), the classic redundancy
    trade."""
    if centroids is None:
        centroids = train_ivf_centroids(emb, nlist=nlist, vec_col=vec_col)
    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    q_cells = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]
    bc = emb.sparkSession.sparkContext.broadcast(
        (q_ids, q_mat, q_cells, centroids, assign)
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm, qc, cent, asg = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            m = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            csim = m @ cent.T
            if asg <= 1:
                cells = np.argmax(csim, axis=1)[:, None]
            else:
                cells = np.argpartition(-csim, asg - 1, axis=1)[:, :asg]
            sims = qm @ m.T
            sims[qi[:, None] == ids[None, :]] = -np.inf
            # zero out vectors none of whose cells is probed by the query
            probe_mask = (
                cells[None, :, :, None] == qc[:, None, None, :]
            ).any(axis=(2, 3))
            sims = np.where(probe_mask, sims, -np.inf)
            # A multi-assigned index can land several copies of one vector
            # in a single coalesced scan batch; each id holds at most `asg`
            # top-k slots, so a k·asg cut guarantees the k best DISTINCT
            # ids survive the per-batch truncation (the global
            # dropDuplicates+window then collapses the copies).
            kk = min(k * max(asg, 1), sims.shape[1])
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            rows = np.repeat(qi, kk)
            cols = part.ravel()
            vals = sims[np.repeat(np.arange(len(qi)), kk), cols]
            keep = np.isfinite(vals)
            yield pd.DataFrame(
                {
                    "query_id": rows[keep],
                    "neighbor_id": ids[cols][keep],
                    "cosine": np.round(vals[keep], 6),
                }
            )

    partial = emb.mapInPandas(kernel, schema=_TOPK_SCHEMA)
    # a multi-assigned index materializes the same vector in several cell
    # partitions — collapse duplicates before ranking (no-op at assign=1)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        partial.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF index materialization: cell-partitioned layout → real partition pruning
# ---------------------------------------------------------------------------

def write_ivf_index(
    emb: DataFrame,
    path: str,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    assign: int = 1,
) -> np.ndarray:
    """Materialize the IVF layout: assign every vector its coarse cell and
    write the table PARTITIONED BY cell, persisting the centroids next to
    the data (_IVF_CENTROIDS.json).

    This is what turns ``nprobe`` from a compute filter into an I/O
    filter: ``ivf_topk_indexed`` reads only the probed cells' partitions —
    at 100 TB the other (nlist − nprobe)/nlist of the table is never
    opened. The write is a one-time cost amortized over every query
    batch, like any index build.

    ``assign > 1`` materializes each vector in its top-``assign`` cells
    (×assign index size): the recall dial that keeps query-side pruning
    intact (see ``ivf_topk``). The setting is recorded in the centroids
    metadata so the query path masks identically.
    """
    import json
    import posixpath

    if centroids is None:
        centroids = train_ivf_centroids(emb, nlist=nlist, vec_col=vec_col)
    bc = emb.sparkSession.sparkContext.broadcast((centroids, assign))
    cell_schema = T.StructType(
        list(emb.schema.fields) + [T.StructField("cell", T.IntegerType())]
    )

    def assign_cells(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        cent, asg = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            csim = m @ cent.T
            if asg <= 1:
                pdf = pdf.copy()
                pdf["cell"] = np.argmax(csim, axis=1).astype(np.int32)
                yield pdf
            else:
                top = np.argpartition(-csim, asg - 1, axis=1)[:, :asg]
                rep = pdf.loc[pdf.index.repeat(asg)].reset_index(drop=True)
                rep["cell"] = top.ravel().astype(np.int32)
                yield rep

    emb.mapInPandas(assign_cells, schema=cell_schema).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)
    # centroids ride with the index (driver-side JSON; tiny)
    sc = emb.sparkSession.sparkContext
    jvm_path = posixpath.join(path, "_IVF_CENTROIDS.json")
    # write through the local FS when possible, else Hadoop FS via spark.
    # The fallback dir is a SIBLING of the index path with no leading
    # underscore: Hadoop's hidden-file filter skips `_`-prefixed paths, so
    # a `_....d` dir inside the index would be unreadable by textFile —
    # and a non-underscore dir inside it would break spark.read.parquet.
    meta = {"centroids": centroids.tolist(), "assign": int(assign)}
    try:
        with open(jvm_path, "w") as fh:
            json.dump(meta, fh)
    except OSError:
        # mirror the parquet write's mode("overwrite"): a rebuild at the
        # same remote path must replace the sibling metadata dir, and
        # saveAsTextFile hard-fails on an existing target — delete it
        # first through the Hadoop FS API
        sibling = _centroids_sibling(path)
        jvm = sc._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(sibling)
        fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            fs.delete(hpath, True)
        sc.parallelize([json.dumps(meta)], 1).saveAsTextFile(sibling)
    return centroids


def _centroids_sibling(path: str) -> str:
    """HDFS/S3 location of the centroids for an index at ``path``."""
    return path.rstrip("/") + ".IVF_CENTROIDS.d"


def ivf_topk_indexed(
    spark,
    path: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k over a materialized cell-partitioned index: only the
    partitions of cells probed by SOME query are read (Catalyst partition
    pruning on the ``cell`` directory column); the in-kernel per-query
    cell mask then applies each query's own nprobe subset exactly as
    ``ivf_topk`` does."""
    import json
    import os

    try:
        with open(os.path.join(path, "_IVF_CENTROIDS.json")) as fh:
            blob = fh.read()
    except OSError:
        # index on HDFS/S3: write_ivf_index persisted the centroids as a
        # single-part text dir NEXT TO the index — read it back through
        # the Hadoop FS so the query path works wherever the index lives
        blob = "".join(
            spark.sparkContext.textFile(_centroids_sibling(path)).collect()
        )
    meta = json.loads(blob)
    if isinstance(meta, list):  # pre-r5 index: bare centroid list
        meta = {"centroids": meta, "assign": 1}
    centroids = np.array(meta["centroids"], dtype=np.float64)
    assign = int(meta.get("assign", 1))
    q_mat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    q_cells = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]
    probed = sorted({int(c) for row in q_cells for c in row})
    df = (
        spark.read.parquet(path)
        .filter(F.col("cell").isin(probed))
        .drop("cell")
    )
    return ivf_topk(
        df, queries, k=k, nlist=len(centroids), nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, centroids=centroids, assign=assign,
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze & Schmid, TPAMI 2011): compress vectors
# to m sub-codes, score with per-query ADC lookup tables
# ---------------------------------------------------------------------------

def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 7,
    vec_col: str = "embedding",
    fraction: float | None = None,
) -> np.ndarray:
    """Driver-side PQ codebook training: split each (normalized) vector
    into ``m`` contiguous subvectors of d/m dims and run an independent
    seeded k-means (``ksub`` centroids, L2 — the PQ objective is
    reconstruction error) per subspace over the SAME content-hash,
    content-ordered sample as ``train_ivf_centroids`` — so the codebooks
    are a pure function of corpus content, invariant to partitioning.

    Returns (m, ksub, dsub) float64. Memory/scale math: the codebooks
    are m·ksub·dsub = d·ksub floats — kilobytes — while the encoded
    corpus shrinks from d floats to m small ints per vector (64-dim
    float64 → 8 bytes of codes is 64×), which is what lets a 100 TB
    embedding table's index live in a fraction of the scan budget.
    """
    d_probe = len(emb.select(vec_col).first()[0])
    if d_probe % m != 0:
        raise ValueError(f"m={m} must divide the embedding dim {d_probe}")
    n = None
    if fraction is None:
        n = emb.count()
        fraction = min(1.0, (sample * 1.2) / max(n, 1))
    frac = min(1.0, fraction)
    mod = 1 << 30
    pdf = (
        emb.select(vec_col)
        .filter(
            F.pmod(F.xxhash64(F.col(vec_col)) + F.lit(int(seed)), F.lit(mod))
            < F.lit(int(frac * mod))
        )
        .toPandas()
    )
    x = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
    if len(x) == 0:
        n_rows = n if n is not None else emb.count()
        if n_rows > max(sample * 50, 100_000):
            raise ValueError(
                f"content-hash sample at fraction={frac:g} selected 0 of "
                f"{n_rows} rows; raise `fraction` (the full-table fallback "
                "is reserved for small tables)"
            )
        pdf = emb.select(vec_col).toPandas()
        x = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
    x = x[np.lexsort(x.T)]  # content order: collect-order invariant
    rng = np.random.default_rng(seed)
    if len(x) > sample:
        x = x[rng.choice(len(x), size=sample, replace=False)]
    dsub = x.shape[1] // m
    kk = min(ksub, len(x))
    books = np.empty((m, kk, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cent = xs[rng.choice(len(xs), size=kk, replace=False)].copy()
        for _ in range(iters):
            # L2 argmin via the dot-product identity (||c||² constant per c)
            a = np.argmax(xs @ cent.T - 0.5 * (cent * cent).sum(1), axis=1)
            # scatter-add cluster means — np.add.at accumulates in original
            # row order, bit-identical to the old per-cluster mask+np.mean
            # loop (verified), without kk mask scans + 41k tiny np.mean
            # calls per training (that Python-call overhead was ~2s of the
            # ann_pq row)
            sums = np.zeros((kk, dsub))
            np.add.at(sums, a, xs)
            cnt = np.bincount(a, minlength=kk)
            nzc = np.flatnonzero(cnt)
            cent[nzc] = sums[nzc] / cnt[nzc, None]
        books[j] = cent
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to its m nearest-sub-centroid codes (the PQ
    index): one Arrow pass, output (id, codes array<int>) — the 64×
    smaller relation ADC scans instead of the raw vectors."""
    bc = emb.sparkSession.sparkContext.broadcast(codebooks)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    def kernel(batches):
        books = bc.value
        m, kk, dsub = books.shape
        half = 0.5 * (books * books).sum(axis=2)  # (m, kk)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * dsub : (j + 1) * dsub]
                codes[:, j] = np.argmax(xs @ books[j].T - half[j], axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "codes": list(codes),
                }
            )

    return emb.mapInPandas(kernel, schema=schema)


def pq_topk(
    codes: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks: np.ndarray,
    k: int = 10,
    emb: DataFrame | None = None,
    refine: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k over the PQ code
    relation: per query build the (m, ksub) lookup table of subvector
    dot products ONCE, then each candidate costs m table lookups — no
    float vector is read at scan time. Returns (query_id, neighbor_id,
    score) with score = the ADC inner-product estimate.

    ``refine > 1`` adds the standard re-ranking stage (IVFADC+R,
    Jégou 2011 §V): ADC keeps the top k·refine candidates, then ONE
    broadcast-semi-join scan of the raw ``emb`` table rescores exactly
    that candidate set with true cosines — the shuffle is q·k·refine
    rows, never the corpus, and the final ranking is exact over the
    candidate pool (recall is then bounded only by ADC's candidate
    recall, the cheap dial).
    """
    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    m, kk_books, dsub = codebooks.shape
    # LUT[q, j, c] = q_sub_j · codebook[j, c]
    lut = np.einsum(
        "qjd,jcd->qjc", q_mat.reshape(len(q_mat), m, dsub), codebooks
    )
    bc = codes.sparkSession.sparkContext.broadcast((q_ids, lut))
    kraw = k * max(int(refine), 1)

    def kernel(batches):
        qi, tab = bc.value
        nq = len(qi)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy()
            cm = np.array(list(pdf["codes"]), dtype=np.int64)  # (b, m)
            sims = np.zeros((nq, len(ids)), dtype=np.float64)
            for j in range(tab.shape[1]):
                sims += tab[:, j, cm[:, j]]
            sims[qi[:, None] == ids[None, :]] = -np.inf
            kb = min(kraw, sims.shape[1])
            cols = np.empty((nq, kb), dtype=np.int64)
            for i in range(nq):
                order = np.lexsort((ids, -sims[i]))
                cols[i] = order[:kb]
            rows = np.repeat(qi, kb)
            flat = cols.ravel()
            yield pd.DataFrame(
                {
                    "query_id": rows,
                    "neighbor_id": ids[flat],
                    "cosine": np.round(
                        sims[np.repeat(np.arange(nq), kb), flat], 6
                    ),
                }
            )

    partial = codes.mapInPandas(kernel, schema=_TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    adc = (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= kraw)
        .select("query_id", "neighbor_id", "cosine")
    )
    if refine <= 1 or emb is None:
        return adc.select(
            "query_id", "neighbor_id", F.col("cosine").alias("score")
        )

    # exact re-rank: one scan of emb, hash-joined against the BROADCAST
    # candidate list (q·k·refine rows), exact cosine per surviving row
    cand = adc.select("query_id", "neighbor_id")
    bcq = emb.sparkSession.sparkContext.broadcast((q_ids, q_mat))
    pairs = emb.join(
        F.broadcast(cand),
        emb[id_col] == cand["neighbor_id"],
    ).select("query_id", "neighbor_id", vec_col)

    def rescore(batches):
        qi, qm = bcq.value
        pos = {int(q): i for i, q in enumerate(qi)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            qrows = qm[[pos[int(q)] for q in pdf["query_id"]]]
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cosine": np.round((qrows * v).sum(axis=1), 6),
                }
            )

    exact = pairs.mapInPandas(rescore, schema=_TOPK_SCHEMA)
    return (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.col("cosine").alias("score"))
    )
