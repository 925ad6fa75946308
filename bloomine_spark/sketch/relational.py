"""Sketches as relational algebra — engine-portable, oracle-hash-checkable.

The numpy kernels in this package (cms.py, theta.py, minhash.py) are the
throughput path: private xxhash64-based hashing, Arrow-batched partial
aggregation, tree-reduce merges. Their estimates are only *bound*-checkable
by an external oracle, because no other engine can recompute the hash.

This module re-expresses the same sketch SEMANTICS as pure Catalyst
expressions over an md5-derived hash that any SQL engine reproduces
bit-for-bit (md5 → first 8/16 hex chars → integer). The DuckDB oracle then
hash-checks the sketch's EXACT output — including its collision noise —
proving the estimate structure, not just a tolerance band. Reference
parity: the sketches mirror BlooMine's screen-sketch roles
(src/Sketchutils.hpp k-mer hashing; src/BFiltutils.hpp prescreen
membership) generalized per SURVEY.md §2 A7/A8.

Scale notes (100 TB framing):
- CMS: the materialized (seed, bucket) → count table has d·w rows
  REGARDLESS of corpus size — the count table IS the sketch. Updates are
  one corpus scan (seed explode = map-side, partial-aggregated before the
  shuffle of at most d·w groups); probes broadcast-join the tiny sketch
  table. No driver-side state.
- KMV: per-group state is the k smallest distinct hashes — a bounded
  window (row_number ≤ k) after a groupBy-distinct, shuffling only
  (group, hash) pairs. Union/intersection estimates compose from the
  k-min sets relationally.

All hashes here use the FIRST 8 hex chars of md5 (32-bit) for bucket
indexing and 16 chars (63-bit via signed-safe parse) for order statistics;
both parse identically in Spark (`conv(hex,16,10)`) and DuckDB
(`('0x'||hex)::BIGINT`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_relational_bits",
    "bloom_relational_probe",
    "cms_relational_counts",
    "cms_relational_estimates",
    "hll_relational_estimates",
    "hll_relational_registers",
    "kmv_relational",
    "kmv_set_estimates",
    "minhash_relational",
    "minhash_relational_jaccard",
    "sample_quantiles_relational",
    "simhash_relational",
]


def _bucket32(seed_col, value_col, w: int):
    """Portable bucket index: first 8 md5 hex chars → uint32 → mod w."""
    h = F.md5(F.concat_ws(":", seed_col.cast("string"), value_col))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(w)).alias(
        "b"
    )


def bloom_relational_bits(
    items: DataFrame, item_col: str, m: int = 16384, k: int = 3
) -> DataFrame:
    """Bloom filter as a relation of set bit positions.

    The reference's core sketch (src/BFiltutils.hpp build; sizing quirks
    live in sketch/bloom.py) re-expressed as pure Catalyst algebra: each
    inserted item sets k bits, bit_s = md5(s:item)[0:8] mod m — k
    INDEPENDENT seeded hashes rather than (h1 + s*h2) mod m double
    hashing, which at composite m degenerates to a short probe cycle
    (the realized-FPP pathology documented on sketch/bloom.py's kernel;
    per-seed independent hashing is immune by construction).

    The returned (b) relation IS the filter: at most min(m, n*k) rows at
    ANY corpus size, built in one scan (seed explode is map-side, the
    distinct shuffles bounded-by-m bit ids), mergeable with another
    filter by union+distinct. The DuckDB oracle rebuilds the identical
    bit set, so membership — INCLUDING false positives — hash-checks.
    """
    stream = items.select(
        F.col(item_col).alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("s"),
    )
    return stream.select(_bucket32(F.col("s"), F.col("_v"), m)).distinct()


def bloom_relational_probe(
    bits: DataFrame, probes: DataFrame, probe_col: str, m: int = 16384, k: int = 3
) -> DataFrame:
    """Probe the relational Bloom filter: an item might_contain iff ALL
    k of its probe positions are set. Each probe row joins the (tiny,
    broadcast) bit relation; pass = every seed's position hit. Duplicate
    positions across seeds count once per seed, mirroring the kernel's
    per-probe semantics — n_hit == k is the membership rule either way.
    Returns (probe_col, might_contain); false positives fall out of the
    shared bit layout and are exactly reproducible by the oracle."""
    p = probes.select(
        F.col(probe_col),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("s"),
    ).select(probe_col, _bucket32(F.col("s"), F.col(probe_col), m))
    hit = bits.withColumn("_hit", F.lit(1))
    return (
        p.join(F.broadcast(hit), "b", "left")
        .groupBy(probe_col)
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias("_n_hit"))
        .select(
            probe_col,
            (F.col("_n_hit") == k).alias("might_contain"),
        )
    )


def cms_relational_counts(
    items: DataFrame, item_col: str, d: int = 4, w: int = 4096
) -> DataFrame:
    """Materialize a count-min sketch as a (s, b, cnt) relation.

    One corpus scan: each item occurrence explodes into d (seed, bucket)
    updates, partial-aggregated map-side, shuffled into at most d·w
    groups. The result is the sketch — O(d·w) rows at ANY corpus size.
    """
    stream = items.select(
        F.col(item_col).alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("s"),
    )
    return (
        stream.select("s", _bucket32(F.col("s"), F.col("_v"), w))
        .groupBy("s", "b")
        .agg(F.count("*").alias("cnt"))
    )


def cms_relational_estimates(
    counts: DataFrame, keys: DataFrame, key_col: str, d: int = 4, w: int = 4096
) -> DataFrame:
    """Probe the relational CMS: est(key) = min over d seeds of the
    bucket count. The d·w-row sketch broadcasts; the probe is a
    broadcast-hash join however many keys there are."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("s"),
    ).select(key_col, "s", _bucket32(F.col("s"), F.col(key_col), w))
    return (
        probes.join(F.broadcast(counts), ["s", "b"])
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("est_freq"))
    )


def _hash63(value_col):
    """Portable 63-bit order-statistic hash: first 16 md5 hex chars with
    the top bit masked off (both engines parse as a NON-NEGATIVE BIGINT,
    so integer order == unsigned order; Spark's conv would wrap ≥ 2^63
    negative while DuckDB's ::BIGINT errors — masking the first nibble to
    0-7 sidesteps both)."""
    h = F.substring(F.md5(value_col), 1, 16)
    # mask the top bit by translating the leading nibble 8-f -> 0-7
    lead = F.translate(
        F.substring(h, 1, 1), "89abcdef", "01234567"
    )
    return F.conv(F.concat(lead, F.substring(h, 2, 15)), 16, 10).cast("long")


def kmv_relational(
    items: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 1024,
    presalt: int | None = None,
) -> DataFrame:
    """K-minimum-values (theta-family) sketch per group, relationally:
    the k smallest DISTINCT 63-bit hashes of the group's items.

    Returns (group, hv, rn) with rn = 1..k ascending. Distinct-estimate
    for a full sketch = (k-1) / (hv_k / 2^63); see kmv_set_estimates for
    the composed union/intersection algebra.

    `presalt`: the scale path. A single window per group SORTS the whole
    group — fine at 10^6 distinct, a straggler at 10^9. With presalt=P,
    a first window runs per (group, hv mod P) cell (P-way parallel, each
    1/P the data) and keeps k per cell; the global window then ranks at
    most P·k rows per group. hv mod P is a pure function of the hash, so
    the result is BIT-IDENTICAL to the unsalted sketch (every global
    top-k element is top-k within its own cell) — the oracle is unchanged.
    """
    from pyspark.sql import Window

    hashed = items.select(
        F.col(group_col), _hash63(F.col(item_col)).alias("hv")
    ).distinct()
    if presalt and presalt > 1:
        cell = Window.partitionBy(
            group_col, F.pmod(F.col("hv"), F.lit(presalt))
        ).orderBy("hv")
        hashed = (
            hashed.withColumn("_crn", F.row_number().over(cell))
            .filter(F.col("_crn") <= k)
            .drop("_crn")
        )
    win = Window.partitionBy(group_col).orderBy("hv")
    return (
        hashed.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= k)
    )


def kmv_set_estimates(
    kmv: DataFrame, group_col: str, group_a: str, group_b: str, k: int = 1024
) -> DataFrame:
    """Theta-style set algebra on two relational KMV sketches.

    theta = the k-th smallest hash of the UNION of the two k-min sets
    (both sketches are truncated to the union's theta before any set op —
    the standard theta-sketch rule). Estimates:
      n_union      = (k-1) / (theta / 2^63)
      n_intersect  = |A∩B below theta| / (theta / 2^63)
      n_a_not_b    = |A\\B below theta| / (theta / 2^63)
    All arithmetic is integer/ratio on hash values — DuckDB reproduces it
    exactly (rounded to 2 decimals for float-repr stability).

    Under-full rule (standard KMV): if the union holds fewer than k
    distinct hashes, BOTH input sketches are necessarily complete sets
    (union ⊇ each side, so |union| < k forces |A|,|B| < k) and the
    estimates are the EXACT set-op counts — the (k-1)/theta formula
    would otherwise bias high because theta is then the max hash, not a
    k-th order statistic.
    """
    a = kmv.filter(F.col(group_col) == group_a).select("hv")
    b = kmv.filter(F.col(group_col) == group_b).select("hv")
    union_k = (
        a.union(b)
        .distinct()
        .orderBy("hv")
        .limit(k)
    )
    theta = union_k.agg(F.max("hv").alias("theta"))
    scale = 2.0**63
    below = union_k.crossJoin(F.broadcast(theta)).filter(
        F.col("hv") <= F.col("theta")
    )
    tagged = (
        below.join(a.withColumn("in_a", F.lit(1)), "hv", "left")
        .join(b.withColumn("in_b", F.lit(1)), "hv", "left")
        .select(
            "hv",
            "theta",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
    )
    agg = tagged.groupBy("theta").agg(
        F.count("*").alias("_n_below"),
        F.sum(F.col("in_a") * F.col("in_b"))
        .cast("long")
        .alias("raw_intersect"),
        F.sum(F.col("in_a") * (1 - F.col("in_b")))
        .cast("long")
        .alias("raw_a_not_b"),
    )
    frac = F.col("theta") / F.lit(scale)
    full = F.col("_n_below") >= k
    return agg.select(
        F.col("theta").cast("long").alias("theta"),
        "raw_intersect",
        "raw_a_not_b",
        F.round(
            F.when(full, F.lit(k - 1) / frac).otherwise(
                F.col("_n_below").cast("double")
            ),
            2,
        ).alias("n_union"),
        F.round(
            F.when(full, F.col("raw_intersect") / frac).otherwise(
                F.col("raw_intersect").cast("double")
            ),
            2,
        ).alias("n_intersect"),
        F.round(
            F.when(full, F.col("raw_a_not_b") / frac).otherwise(
                F.col("raw_a_not_b").cast("double")
            ),
            2,
        ).alias("n_a_not_b"),
    )


def hll_relational_registers(
    items: DataFrame, group_col: str, item_col: str, p: int = 12
) -> DataFrame:
    """HyperLogLog registers as a relation: (group, j, mj) with
    j = hv mod 2^p and mj = max over the group's items of
    rho(hv >> p) — rho = leading-zero count + 1 within the
    (63-p)-bit window, computed portably as (63-p+1) - length(bin(w))
    (bin() drops leading zeros in Spark AND DuckDB; w = 0 → full run).

    max() is idempotent and associative, so the register relation
    partial-aggregates map-side and shuffles at most 2^p rows per group
    at ANY corpus size — the relation IS the mergeable sketch (merge of
    two corpora = groupBy(j).max(mj) over the unioned relations).
    """
    m = 1 << p
    wbits = 63 - p
    reg = items.select(
        F.col(group_col), _hash63(F.col(item_col)).alias("hv")
    ).select(
        group_col,
        (F.col("hv") % m).alias("j"),
        F.shiftright("hv", p).alias("w"),
    ).select(
        group_col,
        "j",
        F.when(F.col("w") == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(F.col("w"))))
        .cast("int")
        .alias("rho"),
    )
    return reg.groupBy(group_col, "j").agg(F.max("rho").alias("mj"))


def hll_relational_estimates(
    regs: DataFrame, group_col: str, p: int = 12
) -> DataFrame:
    """Estimate distinct counts from the relational HLL registers, with
    every float step reproducible by the DuckDB oracle:

    - The harmonic sum Σ 2^-mj is computed in EXACT integer arithmetic
      scaled by 2^(63-p+1) (decimal(38,0) in Spark, HUGEINT in DuckDB) —
      no float-summation order dependence — then converted once to
      double (same IEEE rounding in both engines).
    - raw = alpha_m · m² / Σ; small-range (V zero registers > 0 and
      raw < 2.5m) switches to linear counting m·ln(m/V). Large-range
      correction is omitted: with a 63-bit hash, collisions are
      negligible below ~10^18 distinct.

    Integer columns (n_nonzero, sum_rho, reg_checksum) pin the register
    state exactly; est_distinct (rounded to 2) carries the estimate.
    """
    m = 1 << p
    smax = 63 - p + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    c_raw = alpha * m * m * float(1 << smax)
    agg = regs.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_nonzero"),
        F.sum("mj").cast("long").alias("sum_rho"),
        F.sum(F.col("j") * F.col("mj")).cast("long").alias("reg_checksum"),
        F.sum(
            F.expr(f"cast(shiftleft(1L, {smax} - mj) as decimal(38,0))")
        ).alias("_s"),
    )
    s_total = (
        F.col("_s")
        + (F.lit(m) - F.col("n_nonzero")).cast("decimal(38,0)")
        * F.lit(1 << smax).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(c_raw) / s_total
    zeros = F.lit(m) - F.col("n_nonzero")
    est = F.when(
        (zeros > 0) & (raw < F.lit(2.5 * m)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        group_col,
        "n_nonzero",
        "sum_rho",
        "reg_checksum",
        F.round(est, 2).alias("est_distinct"),
    )


def sample_quantiles_relational(
    rows: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    k: int = 256,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    presalt: int | None = None,
) -> DataFrame:
    """Quantile sketch as relational algebra: a bottom-k-by-hash ROW
    sample per group (the KMV idea applied to rows rather than distinct
    values — keep the k rows whose md5(key) hashes smallest), then
    EXPLICIT rank-arithmetic quantiles over the sample: the q-quantile
    is the sample value at 1-based rank 1 + floor((n-1)·q) under
    (value, hash) ordering. No interpolation, so every engine selects
    the EXACT same value and the DuckDB oracle hash-checks the output —
    the hash-checkable twin of the KLL/t-digest kernels (whose
    compaction is order/RNG-dependent and only bound-checkable).

    Sketch properties: mergeable (union two groups' samples and
    re-truncate to the k smallest hashes — associative, order-free);
    bounded O(k) state per group; sample-quantile rank error is
    O(1/sqrt(k)) w.h.p. (Chernoff on the binomial count of sampled rows
    below the true quantile) — bound-gated in pytest against the exact
    companion. `presalt` is the same bit-identical scale path as
    kmv_relational: pre-truncate per (group, hv mod P) cell so no single
    window sorts a whole group.
    """
    from pyspark.sql import Window

    hashed = rows.select(
        F.col(group_col),
        F.col(value_col).alias("_val"),
        _hash63(F.col(key_col).cast("string")).alias("hv"),
    )
    if presalt and presalt > 1:
        cell = Window.partitionBy(
            group_col, F.pmod(F.col("hv"), F.lit(presalt))
        ).orderBy("hv")
        hashed = (
            hashed.withColumn("_crn", F.row_number().over(cell))
            .filter(F.col("_crn") <= k)
            .drop("_crn")
        )
    win = Window.partitionBy(group_col).orderBy("hv")
    samp = (
        hashed.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= k)
    )
    rank_w = Window.partitionBy(group_col).orderBy("_val", "hv")
    n_w = Window.partitionBy(group_col)
    ranked = samp.withColumn("rnk", F.row_number().over(rank_w)).withColumn(
        "n", F.count("*").over(n_w)
    )
    picks = [
        F.max(
            F.when(
                F.col("rnk")
                == F.lit(1) + F.floor((F.col("n") - 1) * F.lit(q)),
                F.col("_val"),
            )
        )
        .cast("long")
        .alias(f"p{int(q * 100)}")
        for q in qs
    ]
    return ranked.groupBy(group_col).agg(
        F.count("*").cast("long").alias("k_used"), *picks
    )


def minhash_relational(
    items: DataFrame, group_col: str, item_col: str, n_perm: int = 32
) -> DataFrame:
    """MinHash signature per group as a relation: (group, perm, minh)
    with minh = min over items of the portable 63-bit hash of
    'perm:item'. One corpus scan (seed explode is map-side); min()
    partial-aggregates, so at most n_perm rows per group shuffle."""
    stream = items.select(
        F.col(group_col),
        F.col(item_col).alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(n_perm - 1))).alias("perm"),
    )
    hv = _hash63(
        F.concat_ws(":", F.col("perm").cast("string"), F.col("_v"))
    )
    return (
        stream.select(group_col, "perm", hv.alias("hv"))
        .groupBy(group_col, "perm")
        .agg(F.min("hv").alias("minh"))
    )


def minhash_relational_jaccard(
    sigs: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    n_perm: int = 32,
) -> DataFrame:
    """Estimated Jaccard between two groups from their relational MinHash
    signatures: fraction of agreeing permutations. n_match is the exact
    integer pin; est_jaccard = n_match / n_perm is exact in binary for
    power-of-two n_perm, so it hash-matches as a double too."""
    a = sigs.filter(F.col(group_col) == group_a).select(
        "perm", F.col("minh").alias("ha")
    )
    b = sigs.filter(F.col(group_col) == group_b).select(
        "perm", F.col("minh").alias("hb")
    )
    return (
        a.join(b, "perm")
        .agg(
            F.sum((F.col("ha") == F.col("hb")).cast("int"))
            .cast("long")
            .alias("n_match")
        )
        .select(
            "n_match",
            F.lit(n_perm).cast("long").alias("n_perm"),
            (F.col("n_match") / F.lit(n_perm)).alias("est_jaccard"),
        )
    )


def simhash_relational(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per doc as pure Catalyst expressions over the
    portable 63-bit md5 hash of each word (bit 63 is always 0 — a 63-bit
    simhash in a 64-bit frame; near-dup semantics unchanged).

    sign(bit) = (#words with bit set) vs (#words without); ties (equal
    counts) resolve to 0, exactly reproducible in SQL. Returns
    (doc, simhash) with simhash as a 16-char zero-padded hex string —
    string form keeps the value unsigned-safe in every engine.
    """
    words = docs.select(
        F.col(doc_col),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    ).select(doc_col, _hash63(F.col("w")).alias("hv"))
    agg = words.groupBy(doc_col).agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright("hv", i).bitwiseAND(F.lit(1))).alias(f"c{i}")
            for i in range(bits - 1)
        ],
    )
    sim = None
    for i in range(bits - 1):
        bit = F.when(F.col(f"c{i}") * 2 > F.col("n"), F.lit(1)).otherwise(
            F.lit(0)
        )
        term = bit.cast("long") * F.lit(1 << i).cast("long")
        sim = term if sim is None else sim + term
    return agg.select(
        F.col(doc_col),
        F.lpad(F.lower(F.hex(sim)), 16, "0").alias("simhash"),
    )


def countsketch_relational_f2(
    items: DataFrame,
    group_col: str,
    item_col: str,
    d: int = 5,
    w: int = 1024,
) -> DataFrame:
    """Count-Sketch (Charikar 2002) + AMS F2 per group as PURE Catalyst
    relational algebra — the oracle-hash twin of the numpy kernel in
    sketch/countsketch.py (same estimator, engine-portable hashes, so
    DuckDB rebuilds the IDENTICAL signed-counter table and the F2
    estimate hash-matches INCLUDING collision noise).

    One corpus scan: each occurrence explodes into d seed rows; one md5
    per (seed, item) supplies both the bucket (first 8 hex chars mod w)
    and the sign (hex char 9 parity → ±1). Counters are SUM(sign) over
    at most d·w groups per group key; each seed's Σcnt² is an AMS F2
    estimator; the estimate is the exact MEDIAN seed (d odd, rank
    (d+1)/2 by (f2, seed) — relational, no engine median function).

    Returns (group, f2_est)."""
    if d % 2 == 0:
        raise ValueError("d must be odd (exact relational median)")
    stream = items.select(
        F.col(group_col).alias("g"),
        F.col(item_col).cast("string").alias("_v"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("s"),
    )
    h = F.md5(F.concat_ws(":", F.col("s").cast("string"), F.col("_v")))
    signed = stream.select(
        "g",
        "s",
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % w).alias("b"),
        (
            F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 * 2 - 1
        ).alias("sign"),
    )
    counters = signed.groupBy("g", "s", "b").agg(
        F.sum("sign").cast("long").alias("cnt")
    )
    per_seed = counters.groupBy("g", "s").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("f2s")
    )
    from pyspark.sql import Window

    rk = Window.partitionBy("g").orderBy("f2s", "s")
    return (
        per_seed.withColumn("_rn", F.row_number().over(rk))
        .filter(F.col("_rn") == (d + 1) // 2)
        .select(
            F.col("g").alias(group_col),
            F.col("f2s").alias("f2_est"),
        )
    )
