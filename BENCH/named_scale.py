"""Scaling evidence for the round-6 named-method tail (Kneser–Ney LM,
CCNet terciles, C4 rule pack, UniMax, SemDeDup pairs): the same job on
the same input at two parallelism levels (N vs 4N cores — the sandbox
stand-in for N vs 4N executors, north-rule protocol), methodology of
BENCH/curation_scale.py (paired back-to-back subprocesses per job,
pinned leaf splits, pinned GC threads, best-of-reps). Separate record —
fingerprinted kernel campaigns untouched.

Inputs: the shared generated documents fixture (40 hash-picked words
from a 50k-type vocab per doc, pure codegen, 64 pinned splits); for C4
the fixture is planted with page structure exactly like the driver
query (1/7 of pages get punctuated lines) so the line filters do real
work; SemDeDup uses a generated 64-dim embedding table (n_docs/8
vectors, 64 sign cells → ~task-sized cells, blockwise matmul kernel).

Writes BENCH/NAMED_SCALE.md + BENCH/named_scale.json and prints one
JSON line.

Usage: python BENCH/named_scale.py [n_docs] [base_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    "jvm_control_explode_count",
    "kn_nll",
    "ccnet_buckets",
    "c4_clean",
    "unimax",
    "semdedup_pairs",
]
CONTROLS = {"jvm_control_explode_count"}

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from bloomine_spark.session import get_spark

cores = int(sys.argv[1])
n_docs = int(sys.argv[2])
job = sys.argv[3]
reps = int(sys.argv[4])
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=64,
                  app_name=f"namedscale-{{cores}}-{{job}}",
                  extra_conf={{
                      "spark.sql.files.maxPartitionBytes": "512m",
                      "spark.sql.files.minPartitionNum": "64",
                      "spark.driver.extraJavaOptions":
                          f"-XX:ParallelGCThreads={{cores}} -XX:ConcGCThreads={{max(1, cores // 4)}}",
                  }})
spark.sparkContext.setLogLevel("ERROR")
import os
path = {repo!r} + f"/.data/tokdocs_{{n_docs}}.parquet"
if not os.path.isdir(path):
    (spark.range(0, n_docs, numPartitions=64)
        .select(
            F.concat(F.lit("s"), (F.col("id") % 10).cast("string"))
             .alias("source"),
            F.col("id").alias("doc_id"),
            F.expr("concat_ws(' ', transform(sequence(1, 40),"
                   " j -> concat('w', pmod(xxhash64(id, j), 50000))))")
             .alias("text"),
        )
        .write.mode("overwrite").parquet(path))
docs = spark.read.parquet(path)
n_tokens = n_docs * 40

n_vecs = n_docs
vpath = {repo!r} + f"/.data/scalevecs_{{n_vecs}}.parquet"
if job == "semdedup_pairs" and not os.path.isdir(vpath):
    (spark.range(0, n_vecs, numPartitions=64)
        .select(
            F.col("id").alias("vec_id"),
            F.expr("transform(sequence(0, 63), j -> "
                   "cast(pmod(xxhash64(id, j), 2001) as double)/1000.0"
                   " - 1.0)").alias("embedding"),
        )
        .write.mode("overwrite").parquet(vpath))

from bloomine_spark.operators.dedup import (
    semdedup_pairs, semdedup_sign_cells)
from bloomine_spark.operators.mixture import unimax_plan
from bloomine_spark.operators.textops import (
    c4_clean, ccnet_ppl_buckets, kneser_ney_ppl_per_source)

# the driver query's planting: 1/7 of pages become punctuated
# multi-line text so the C4 line filters do real string work
_planted = docs.withColumn(
    "text",
    F.when(F.col("doc_id") % 7 == 0,
           F.concat(F.replace(F.col("text"), F.lit(" w1"),
                              F.lit(".\nw1")), F.lit(".")))
     .otherwise(F.col("text")),
)

FNS = {{
    "jvm_control_explode_count":
        lambda: docs.select(F.explode(F.split("text", " ")).alias("t"))
                .filter(F.col("t") != "").agg(F.count("*")).head(),
    "kn_nll": lambda: kneser_ney_ppl_per_source(docs).collect(),
    "ccnet_buckets": lambda: ccnet_ppl_buckets(docs)
        .agg(F.count("*"), F.sum("n_docs")).head(),
    "c4_clean": lambda: _planted.transform(c4_clean)
        .agg(F.sum("n_lines_kept"), F.sum(F.col("page_keep").cast("long")))
        .head(),
    "unimax": lambda: unimax_plan(
        docs.withColumn("n_tok", F.size(F.split("text", " "))),
        max_epochs=3, budget_ratio=(1, 2)).collect(),
    "semdedup_pairs": lambda: semdedup_pairs(
        semdedup_sign_cells(
            spark.read.parquet(vpath), n_bits=8),
        threshold=0.9).agg(F.count("*")).head(),
}}

docs.select(F.count("*")).head()  # warmup: page cache + codegen hot

fn = FNS[job]
best = float("inf")
for _ in range(reps):
    t0 = time.time(); fn(); best = min(best, time.time() - t0)
print("RESULT " + json.dumps({{"cores": cores, "tokens": n_tokens,
                               "job": job, "best": round(best, 3)}}))
spark.stop()
"""


def run(cores: int, n_docs: int, job: str, reps: int) -> dict:
    script = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n_docs), job,
         str(reps)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = base * 4
    t_base: dict[str, float] = {}
    t_hi: dict[str, float] = {}
    tokens = 0
    # light jobs are scan-bound maps/tiny aggs: at the LM jobs' doc count
    # they finish in ~1s and fixed job overhead swamps the scaling signal
    # (even the JVM control drops to ~0.33) — give them 8× the docs;
    # semdedup gets n_docs VECTORS in 256 cells (≈2k rows/cell, the
    # task-sized design point)
    sizes = {j: n_docs for j in JOBS}
    for j in ("jvm_control_explode_count", "c4_clean", "unimax"):
        sizes[j] = n_docs * 8
    for job in JOBS:
        # paired back-to-back so the box's throttle drift hits both sides
        r_hi = run(hi, sizes[job], job, 3)
        r_lo = run(base, sizes[job], job, 3)
        t_hi[job], t_base[job] = r_hi["best"], r_lo["best"]
        tokens = r_hi["tokens"]
        print(f"{job}: {base}c {t_base[job]}s  {hi}c {t_hi[job]}s  "
              f"eff {t_base[job] / (4 * t_hi[job]):.3f}", flush=True)

    eff = {j: round(t_base[j] / (4 * t_hi[j]), 3) for j in JOBS}
    engine_min = min(v for j, v in eff.items() if j not in CONTROLS)
    rec = {
        "n_docs": n_docs, "job_sizes": sizes, "tokens": tokens,
        "base_cores": base,
        "times_base": t_base, "times_4x": t_hi, "efficiency": eff,
        "control_efficiency": eff["jvm_control_explode_count"],
        "min_engine_efficiency": engine_min,
    }
    with open(os.path.join(REPO, "BENCH", "named_scale.json"), "w") as f:
        json.dump(rec, f, indent=1)

    rows = "\n".join(
        f"| {j} | {t_base[j]} | {t_hi[j]} | {eff[j]}"
        f"{' (control)' if j in CONTROLS else ''} |"
        for j in JOBS
    )
    md = f"""# Named-method family scaling (N vs 4N cores)

Input: generated docs x 40 words from a 50k-type vocab (pure-codegen
fixture, .data parquet, 64 pinned leaf splits): {n_docs:,} docs for the
LM jobs, {n_docs * 8:,} for the scan-bound light jobs (control, c4,
unimax — at the LM size they finish in ~1s and fixed overhead swamps
the signal); SemDeDup on {n_docs:,} generated 64-dim vectors in 256
sign cells (≈2k rows/cell). Paired back-to-back runs per job, best of 3,
local[{base}] vs local[{hi}]. Same box caveats as BENCH/BASELINE.md:
the JVM-codegen control bounds what this shared-DRAM VM can evidence
in the same window; engine jobs at or above the control add no scaling
penalty of their own.

| job | {base}c secs | {hi}c secs | efficiency |
|---|---|---|---|
{rows}

kn_nll carries the bigram aggregate plus both KN marginals; ccnet adds
one per-source window over (source, doc_id, nll) on top of the same
scoring head; c4_clean is a zero-shuffle codegen map (scan-bound by
construction); unimax is scan + a tiny per-source aggregate; semdedup
is the cell-grouped Arrow matmul kernel (one exchange).
"""
    with open(os.path.join(REPO, "BENCH", "NAMED_SCALE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"metric": "named-method family min engine efficiency",
                      "value": engine_min, "unit": "ratio",
                      "detail": eff}))


if __name__ == "__main__":
    main()
