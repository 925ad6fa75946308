"""Scaling evidence for the batch-assembly operators (packing + mixture):
the same job on the same input at two parallelism levels (N vs 4N cores,
the sandbox stand-in for N vs 4N executors — north-rule protocol), using
the exact methodology of BENCH/scaling.py (paired back-to-back
subprocesses per job, pinned leaf splits, pinned GC threads, best-of-reps).
Separate record — the fingerprinted kernel campaigns are never touched.

Input: packing is per-DOCUMENT work (the token arrays never enter the
plan — only (source, doc_id, n_tok) rides the shuffle), so the sequence
table used by the token-fold campaigns is the wrong fixture: at any SF
its doc count gives ~2 s jobs dominated by fixed stage-launch overhead
(measured: even the codegen control "scales" at 0.5 there). This
campaign generates a dedicated doc-metadata table — spark.range + pure
codegen hash expressions, 24M rows over 10 sources, no Python, no
arrays — so the window-sort work dominates the clock at both
parallelism levels.

Jobs:
 * jvm_control_md5_fold — same-window Catalyst codegen control: the
   identical scan + an md5-bucket fold, embarrassingly parallel.
 * jvm_control_shuffle_sort — the box's shuffle+sort ceiling: the SAME
   exchange + per-(source, shard) sort shape as pack_sharded in pure
   JVM Catalyst (window row_number, no packing arithmetic). Packing
   shuffles the whole doc-metadata relation — unlike the sketch folds
   whose shuffles are KB — so its scaling bound on ONE box is the
   shared-DRAM shuffle path (BENCH/bus_probe.py), not the engine; on a
   real cluster each executor brings its own bus and disks.
 * pack_sharded — pack_context_windows shards=64: window parallelism =
   sources × shards = 640 streams, so the sort spreads over every core
   at either level.
 * pack_unsharded — the same pack with shards=1: parallelism is capped
   at 10 (the number of sources), so it CANNOT scale past ~10 busy
   cores. Kept as a contrast row, excluded from the gate — it is the
   measured argument for why the shard path exists.
 * mixture_realize — temperature plan + broadcast realization + copy
   aggregate: two scans of pure codegen expressions, sketch-sized
   shuffles only.

Writes BENCH/PACK_SCALE.md + BENCH/pack_scale.json and prints one JSON
line.

Usage: python BENCH/pack_scale.py [n_docs] [base_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    "jvm_control_md5_fold",
    "jvm_control_shuffle_sort",
    "pack_sharded",
    "pack_unsharded",
    "mixture_realize",
]
CONTROLS = {
    "jvm_control_md5_fold",
    "jvm_control_shuffle_sort",
    "pack_unsharded",
}

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from bloomine_spark.session import get_spark

cores = int(sys.argv[1])
n_rows = int(sys.argv[2])
job = sys.argv[3]
reps = int(sys.argv[4])
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=64,
                  app_name=f"packscale-{{cores}}-{{job}}",
                  extra_conf={{
                      "spark.sql.files.maxPartitionBytes": "512m",
                      "spark.sql.files.minPartitionNum": "64",
                      "spark.driver.extraJavaOptions":
                          f"-XX:ParallelGCThreads={{cores}} -XX:ConcGCThreads={{max(1, cores // 4)}}",
                  }})
spark.sparkContext.setLogLevel("ERROR")
path = {repo!r} + f"/.data/docs_{{n_rows}}.parquet"
import os
if not os.path.isdir(path):
    # doc-metadata fixture: pure codegen, deterministic, 10 sources
    (spark.range(0, n_rows, numPartitions=64)
        .select(
            F.concat(F.lit("s"), (F.col("id") % 10).cast("string")).alias("source"),
            F.col("id").cast("string").alias("doc_id"),
            (F.lit(50) + F.pmod(F.xxhash64("id"), F.lit(200))).cast("long").alias("n_tok"),
        )
        .write.mode("overwrite").parquet(path))
docs = spark.read.parquet(path)
total_tokens = docs.agg(F.sum("n_tok")).head()[0]

from bloomine_spark.operators.mixture import realize_mixture, temperature_mixture_plan
from bloomine_spark.operators.packing import pack_context_windows

FNS = {{
    "jvm_control_md5_fold":
        lambda: docs.select(
            F.conv(F.substring(F.md5("doc_id"), 1, 8), 16, 10)
             .cast("long").alias("b"))
            .agg(F.sum("b")).head(),
    # the SAME exchange + per-(source, shard) sort shape as pack_sharded,
    # in pure JVM Catalyst (window row_number, no packing arithmetic):
    # this is the box's shuffle+sort scaling ceiling for this plan class
    "jvm_control_shuffle_sort":
        lambda: docs.withColumn(
            "shard", F.pmod(F.xxhash64("doc_id"), F.lit(64)))
            .select("source", "shard", "n_tok",
                    F.row_number().over(
                        W.partitionBy("source", "shard").orderBy("doc_id")
                    ).alias("rn"))
            .groupBy("source", "shard")
            .agg(F.max("rn").alias("m"), F.sum("n_tok").alias("s"))
            .agg(F.sum("m"), F.sum("s")).head(),
    "pack_sharded":
        lambda: pack_context_windows(docs, 2048, shards=64)
                .agg(F.sum("n_tokens")).head(),
    "pack_unsharded":
        lambda: pack_context_windows(docs, 2048)
                .agg(F.sum("n_tokens")).head(),
    "mixture_realize":
        lambda: realize_mixture(docs, temperature_mixture_plan(docs))
                .agg(F.sum(F.col("n_tok") * F.col("n_copies"))).head(),
}}

# warmup: one full scan so page cache + codegen are hot for both configs
docs.select(F.sum("n_tok")).head()

fn = FNS[job]
best = float("inf")
for _ in range(reps):
    t0 = time.time(); fn(); best = min(best, time.time() - t0)
print("RESULT " + json.dumps({{"cores": cores, "tokens": int(total_tokens),
                               "job": job, "best": round(best, 3)}}))
spark.stop()
"""


def run(cores: int, n_rows: int, job: str, reps: int) -> dict:
    script = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_rows), job, str(reps)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = base * 4
    t_base: dict[str, float] = {}
    t_hi: dict[str, float] = {}
    tokens = 0
    for job in JOBS:
        # paired back-to-back so the box's throttle drift hits both sides
        r_hi = run(hi, n_rows, job, 3)
        r_lo = run(base, n_rows, job, 3)
        t_hi[job], t_base[job] = r_hi["best"], r_lo["best"]
        tokens = r_hi["tokens"]
        print(f"{job}: {base}c {t_base[job]}s  {hi}c {t_hi[job]}s  "
              f"eff {t_base[job] / (4 * t_hi[job]):.3f}", flush=True)

    eff = {j: round(t_base[j] / (4 * t_hi[j]), 3) for j in JOBS}
    engine_min = min(v for j, v in eff.items() if j not in CONTROLS)
    rec = {
        "n_rows": n_rows, "tokens": tokens, "base_cores": base,
        "times_base": t_base, "times_4x": t_hi, "efficiency": eff,
        "control_efficiency": eff["jvm_control_md5_fold"],
        "shuffle_sort_ceiling_efficiency": eff["jvm_control_shuffle_sort"],
        "unsharded_contrast_efficiency": eff["pack_unsharded"],
        "min_pack_efficiency": engine_min,
        "tokens_per_sec_4x": {
            j: int(tokens / t_hi[j]) for j in JOBS if j not in CONTROLS},
    }
    with open(os.path.join(REPO, "BENCH", "pack_scale.json"), "w") as f:
        json.dump(rec, f, indent=1)

    md = [
        "# Batch-assembly scaling (N vs 4N cores)\n",
        f"Input: {n_rows:,} generated doc-metadata rows over 10 "
        f"sources, {tokens:,} notional tokens (pure-codegen fixture, "
        f".data parquet, 64 pinned leaf splits; token arrays never "
        f"exist — packing is per-doc work). "
        f"Paired back-to-back subprocess runs per job, best of 3, "
        f"local[{base}] vs local[{hi}]. Same box caveats as "
        f"BENCH/BASELINE.md: the JVM-codegen control bounds what this "
        f"VM can evidence in the same window.\n",
        "| job | {}c secs | {}c secs | efficiency |".format(base, hi),
        "|---|---|---|---|",
    ]
    for j in JOBS:
        tag = ""
        if j == "jvm_control_md5_fold":
            tag = " (control: codegen scan)"
        elif j == "jvm_control_shuffle_sort":
            tag = " (control: same-shape JVM shuffle+sort ceiling)"
        elif j == "pack_unsharded":
            tag = " (contrast: parallelism capped at 10 sources)"
        md.append(f"| {j}{tag} | {t_base[j]} | {t_hi[j]} | {eff[j]} |")
    md += [
        "",
        f"Min gated efficiency {engine_min} vs same-window codegen "
        f"control {eff['jvm_control_md5_fold']} and same-SHAPE JVM "
        f"shuffle+sort ceiling {eff['jvm_control_shuffle_sort']} — "
        f"packing shuffles the whole doc-metadata relation, so on one "
        f"box its bound is the shared-DRAM shuffle path, which the "
        f"pure-JVM twin measures; the gap pack_sharded vs that twin is "
        f"the engine's own overhead. The unsharded contrast row "
        f"({eff['pack_unsharded']}) is the measured reason the shard "
        f"path exists — a window partitioned only by source cannot use "
        f"more cores than there are sources, sharding makes the stream "
        f"count sources × shards at ≤1 partial chunk per shard.",
        "",
        "North-rule framing: ≥0.8 scaling efficiency N→4N is evidenced "
        "by cores (local[N] vs local[4N]) per the sandbox protocol; the "
        "narrow (source, shard, doc_id, n_tok) shuffle — token arrays "
        "pruned at the scan — makes the same argument for executors.",
    ]
    with open(os.path.join(REPO, "BENCH", "PACK_SCALE.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({"metric": "batch-assembly scaling efficiency",
                      "value": engine_min, "unit": "ratio", **rec}))


if __name__ == "__main__":
    main()
