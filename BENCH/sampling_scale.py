"""Scaling evidence for the round-6 sampling/compression family
(SoftDedup reweighting, DLT priority sampling, PQ encode + ADC top-k):
the same job on the same input at two parallelism levels (N vs 4N
cores — the sandbox stand-in for N vs 4N executors, north-rule
protocol), methodology of BENCH/named_scale.py (paired back-to-back
subprocesses per job, pinned leaf splits, pinned GC threads,
best-of-reps). Separate record — fingerprinted kernel campaigns
untouched.

Inputs: the shared generated documents fixture for the relational jobs;
priority sampling runs over 8× docs (it is a scan + WindowGroupLimit
top-k, light per row); SoftDedup gets a planted pair graph (chains of
5 every 10 docs — CC closes in ~3 rounds; the deep-diameter CC story
is BENCH/CC_SCALE.md, this job times the group-size/normalize/join
envelope around it); PQ runs over generated 64-dim vectors (encode =
one Arrow argmin pass; query = ADC lookup-table scan, k·refine
candidates, exact re-rank).

Writes BENCH/SAMPLING_SCALE.md + BENCH/sampling_scale.json and prints
one JSON line.

Usage: python BENCH/sampling_scale.py [n_docs] [base_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    "jvm_control_explode_count",
    "priority_sample",
    "soft_dedup",
    "pq_encode",
    "pq_adc_topk",
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
                  app_name=f"samplingscale-{{cores}}-{{job}}",
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
if job.startswith("pq_") and not os.path.isdir(vpath):
    (spark.range(0, n_vecs, numPartitions=64)
        .select(
            F.col("id").alias("vec_id"),
            F.expr("transform(sequence(0, 63), j -> "
                   "cast(pmod(xxhash64(id, j), 2001) as double)/1000.0"
                   " - 1.0)").alias("embedding"),
        )
        .write.mode("overwrite").parquet(vpath))

from bloomine_spark.operators.dedup import soft_dedup_weights
from bloomine_spark.operators.similarity import (
    pq_encode, pq_topk, train_pq_codebooks)
from bloomine_spark.sketch.priority import priority_sample

# planted pair graph for SoftDedup: chains of 5 starting every 10th doc
# (diameter 4 — CC closes in ~3 alternating rounds; deep-diameter CC
# scaling is BENCH/CC_SCALE.md's job, not this one)
_pairs = (spark.range(0, n_docs, numPartitions=64)
          .filter("id % 10 < 4")
          .select(F.col("id").alias("id_a"),
                  (F.col("id") + 1).alias("id_b")))

_books = None
_codes_path = {repo!r} + f"/.data/pqcodes_{{n_vecs}}.parquet"
if job == "pq_adc_topk":
    vecs = spark.read.parquet(vpath)
    _books = train_pq_codebooks(vecs, m=16, ksub=256)
    if not os.path.isdir(_codes_path):
        pq_encode(vecs, _books).write.mode("overwrite").parquet(_codes_path)
    _codes = spark.read.parquet(_codes_path)
    _qs = [(int(r["vec_id"]), list(map(float, r["embedding"])))
           for r in vecs.filter("vec_id < 8").collect()]
elif job == "pq_encode":
    vecs = spark.read.parquet(vpath)
    _books = train_pq_codebooks(vecs, m=16, ksub=256)

FNS = {{
    "jvm_control_explode_count":
        lambda: docs.select(F.explode(F.split("text", " ")).alias("t"))
                .filter(F.col("t") != "").agg(F.count("*")).head(),
    "priority_sample": lambda: priority_sample(
        docs.withColumn("wt", F.length("text").cast("long")),
        64, "wt", group_col="source", salt="sc").collect(),
    "soft_dedup": lambda: soft_dedup_weights(docs, _pairs)
        .agg(F.count("*"), F.sum("weight")).head(),
    "pq_encode": lambda: pq_encode(
        spark.read.parquet(vpath), _books).agg(F.count("*")).head(),
    "pq_adc_topk": lambda: pq_topk(
        _codes, _qs, _books, k=10,
        emb=spark.read.parquet(vpath), refine=8).collect(),
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
    sizes = {j: n_docs for j in JOBS}
    # scan-bound light jobs need more rows for the signal to beat fixed
    # job overhead (same reasoning as named_scale); soft_dedup too — at
    # n_docs its CC rounds are barrier-dominated (measured 0.17 at 500k
    # vs 0.38 at 4M: each alternating round is a full localCheckpoint
    # barrier, so small fixtures expose Amdahl on the round ladder, not
    # the narrow (node,label) shuffle that carries the 100 TB story —
    # that shape is BENCH/CC_SCALE.md's evidence)
    for j in ("jvm_control_explode_count", "priority_sample", "soft_dedup"):
        sizes[j] = n_docs * 8
    # PQ: vectors are 64 doubles each — n_docs vectors is already the
    # right weight class for the Arrow kernels
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
    with open(os.path.join(REPO, "BENCH", "sampling_scale.json"), "w") as f:
        json.dump(rec, f, indent=1)

    rows = "\n".join(
        f"| {j} | {t_base[j]} | {t_hi[j]} | {eff[j]}"
        f"{' (control)' if j in CONTROLS else ''} |"
        for j in JOBS
    )
    md = f"""# Sampling/compression family scaling (N vs 4N cores)

Input: generated docs x 40 words from a 50k-type vocab (pure-codegen
fixture, .data parquet, 64 pinned leaf splits): {n_docs * 8:,} docs
for the scan-bound jobs (control, priority sample) AND SoftDedup (at
smaller sizes its CC rounds are localCheckpoint-barrier-dominated —
0.17 at 500k vs its figure below at 8×; the narrow (node,label)
shuffle that carries the 100 TB story is BENCH/CC_SCALE.md's
rounds-vs-diameter evidence); PQ over {n_docs:,} generated 64-dim
vectors (encode: one
Arrow argmin pass; query: ADC lookup scan + exact re-rank of k·8
candidates). Paired back-to-back runs per job, best of 3,
local[{base}] vs local[{hi}]. Same box caveats as BENCH/BASELINE.md:
the JVM-codegen control bounds what this shared-DRAM VM can evidence
in the same window; engine jobs at or above the control add no scaling
penalty of their own.

| job | {base}c secs | {hi}c secs | efficiency |
|---|---|---|---|
{rows}

priority_sample is scan + WindowGroupLimit partial top-k (shuffle =
O(parts·k) rows per source); soft_dedup times the group-size/normalize
/join envelope on a diameter-4 planted graph (deep-diameter CC:
BENCH/CC_SCALE.md); pq_encode and pq_adc_topk are the Arrow kernels —
memory-bandwidth-bound like the sketch family, so their 4x ceiling on
this shared-DRAM box is the same one BENCH/BASELINE.md documents for
the HLL kernels.
"""
    with open(os.path.join(REPO, "BENCH", "SAMPLING_SCALE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"metric": "sampling family min engine efficiency",
                      "value": engine_min, "unit": "ratio",
                      "detail": eff}))


if __name__ == "__main__":
    main()
