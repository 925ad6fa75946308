"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "tokens_per_sec": <sketch-update+merge throughput>, ...}

The primary workload is the BASELINE.json metric: sketch-update+merge
throughput (tokens/sec) over a synthetic pre-tokenized sequences table
sized ∝ sf (the BlooMine-domain table; hash-generated, deterministic,
cached as parquet under .data/), plus the two-phase screen, cascade, dedup,
ANN, and relational headline queries over the driver testdata.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# sequences-table scale: ~270M tokens/sf-unit → sf0.1 ≈ 27M tokens
ROWS_PER_SF = 1_200_000


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _sequences(spark, sf: float):
    """Synthetic sequences table, generated once and cached as parquet so
    benched queries read through the real scan path."""
    from bloomine_spark.datagen import generate_sequences

    n_rows = max(int(ROWS_PER_SF * sf), 2000)
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".data", f"seq_{n_rows}.parquet"
    )
    if not os.path.isdir(path):
        generate_sequences(spark, n_rows, partitions=64).write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)


def main():
    from pyspark.sql import functions as F

    from bloomine_spark.datagen import DEFAULT_TARGET
    from bloomine_spark.session import get_spark

    sf = _sf_of(SF_DIR)
    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="bloomine-bench",
        shuffle_partitions=max(int(CPUS), 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    seqs = _sequences(spark, sf)
    total_tokens = seqs.agg(F.sum("n_tok")).head()[0]

    # warm up JVM + python workers + arrow path so query 1 isn't charged
    # for process spinup
    from bloomine_spark.sketch.hll import HyperLogLog as _H
    from bloomine_spark.sketch.core import sketch_agg_global as _sag
    _sag(seqs.limit(2000), "tokens", lambda: _H.empty(8))

    times: dict[str, float] = {}

    def bench(name, fn, repeat=1):
        best = float("inf")
        for _ in range(repeat):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
        return best

    # --- sketch-update+merge throughput (the BASELINE metric) -------------
    from bloomine_spark.sketch.cms import CountMinSketch
    from bloomine_spark.sketch.core import sketch_agg, sketch_agg_global
    from bloomine_spark.sketch.hll import HyperLogLog
    from bloomine_spark.sketch.kll import KLL

    t_hll = bench(
        "hll_global_tokens",
        lambda: sketch_agg_global(seqs, "tokens", lambda: HyperLogLog.empty(12)),
    )
    bench(
        "cms_global_tokens",
        lambda: sketch_agg_global(
            seqs, "tokens", lambda: CountMinSketch.empty(1e-3, 1e-2)
        ),
    )
    bench(
        "kll_ntok",
        lambda: sketch_agg_global(seqs, "n_tok", lambda: KLL(k=200)),
    )
    bench(
        "hll_per_source",
        lambda: sketch_agg(
            seqs, ["source"], "tokens", lambda: HyperLogLog.empty(12)
        ).count(),
    )

    # --- two-phase screen --------------------------------------------------
    from bloomine_spark.operators.cascade import cascade
    from bloomine_spark.operators.screen import screen_hits

    bench(
        "screen_scored",
        lambda: screen_hits(seqs, DEFAULT_TARGET).count(),
    )
    bench(
        "screen_exact",
        lambda: screen_hits(seqs, DEFAULT_TARGET, mode="exact").count(),
    )

    def run_cascade():
        hits, s1, s2 = cascade(
            seqs, DEFAULT_TARGET[:12], DEFAULT_TARGET[12:], keep_tokens=False
        )
        hits.count()
        s1.unpersist()
        s2.unpersist()

    bench("cascade_two_flank", run_cascade)

    # --- pipeline + relational headliners over driver testdata -------------
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in (
        "two_phase_screen",
        "minhash_lsh_dups",
        "ngram_jaccard_pairs",
        "ann_cosine_topk",
        "lineitem_pricing_summary",
        "events_hourly_agg",
        "top_order_per_customer",
        "hll_distinct_kgrams_per_source",
    ):
        bench(f"q_{name}", lambda n=name: qs[n](spark, SF_DIR).count())

    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline suite wall-clock (sketch+screen+pipeline)",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": int(CPUS),
        "sequences_rows": seqs.count(),
        "sequences_tokens": int(total_tokens),
        "tokens_per_sec": int(total_tokens / t_hll),
    }
    # attach the latest N-vs-4N scaling evidence (BENCH/scaling.py)
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling.json"
    )
    if os.path.isfile(scaling_path):
        with open(scaling_path) as f:
            out["scaling"] = json.load(f)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
