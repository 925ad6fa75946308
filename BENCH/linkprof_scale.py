"""Scaling evidence for the round-6 twelfth-session family (HITS,
line-df boilerplate, generalization-to-k, blocked Jaro-Winkler,
Soundex keys, lnc.ltc TF-IDF cosine, one-pass profiling): the same job
on the same input at two parallelism levels (N vs 4N cores — the
sandbox stand-in for N vs 4N executors, north-rule protocol),
methodology of BENCH/quality_scale.py (paired back-to-back
subprocesses per job, pinned leaf splits, pinned GC threads,
best-of-reps). Separate record — fingerprinted kernel campaigns
untouched.

Inputs are generated pure-codegen fixtures sized per job: the shared
tokdocs corpus (40 hash-picked words/doc), a line-structured variant
with planted per-source footers, a quasi-identifier table for the
k-anonymity ladder, a blocked name relation sized so the JW pair count
is fixed by construction (block count x block size, independent of
parallelism), and a host edge list for the 8-round HITS iteration.

Writes BENCH/LINKPROF_SCALE.md + BENCH/linkprof_scale.json and prints
one JSON line.

Usage: python BENCH/linkprof_scale.py [n_docs] [base_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    "jvm_control_explode_count",
    "boilerplate_line_df",
    "generalize_to_k",
    "jw_blocked_pairs",
    "tfidf_cosine",
    "hits_8_rounds",
    "profile_table",
]
CONTROLS = {"jvm_control_explode_count"}

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from bloomine_spark.session import get_spark

cores = int(sys.argv[1])
n = int(sys.argv[2])
job = sys.argv[3]
reps = int(sys.argv[4])
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=64,
                  app_name=f"linkprofscale-{{cores}}-{{job}}",
                  extra_conf={{
                      "spark.sql.files.maxPartitionBytes": "512m",
                      "spark.sql.files.minPartitionNum": "64",
                      "spark.driver.extraJavaOptions":
                          f"-XX:ParallelGCThreads={{cores}} -XX:ConcGCThreads={{max(1, cores // 4)}}",
                  }})
spark.sparkContext.setLogLevel("ERROR")
import os
path = {repo!r} + f"/.data/tokdocs_{{n}}.parquet"
if not os.path.isdir(path):
    (spark.range(0, n, numPartitions=64)
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
n_tokens = n * 40

from bloomine_spark.operators.dedup import line_df_boilerplate
from bloomine_spark.operators.linkage import blocked_jw_pairs, soundex_key
from bloomine_spark.operators.linkgraph import hits
from bloomine_spark.operators.privacy import generalize_to_k
from bloomine_spark.operators.profiling import profile_table
from bloomine_spark.operators.retrieval import tfidf_cosine_topk_per_source

# line-structured docs: 5 body lines + a per-source footer on EVERY doc
# (df = 100% of the source -> the drop set is real) + a rare line
_lined = docs.select(
    "source", "doc_id",
    F.concat(
        F.regexp_replace("text", r"((\w+ ){{7}}\w+) ", "$1\n"),
        F.lit("\nfooter for "), F.col("source"),
        F.lit("\nnote "), F.col("doc_id").cast("string"),
    ).alias("text"),
)

# quasi-identifier table for the ladder: 25 nations x 5 segments x
# pseudo-random balance; 3 ladder levels like the driver query
_quasi = spark.range(0, n, numPartitions=64).select(
    F.col("id"),
    (F.col("id") % 25).cast("string").alias("nation"),
    F.concat(F.lit("seg"), (F.col("id") % 5).cast("string")).alias("seg"),
    (F.pmod(F.xxhash64("id"), 11000) - F.lit(1000)).alias("bal"),
)
_ladder = [
    {{"nation": F.col("nation"), "seg": F.col("seg"),
      "band": F.floor(F.col("bal") / 400).cast("string")}},
    {{"nation": F.col("nation"), "seg": F.col("seg"),
      "band": F.floor(F.col("bal") / 4000).cast("string")}},
    {{"nation": F.col("nation"), "seg": F.lit(None).cast("string"),
      "band": F.lit(None).cast("string")}},
]

# blocked name relation: block count x block size fixes the JW pair
# count by construction (pairs = B * s*(s-1)/2), so the Python-kernel
# work is identical at every parallelism level
N_BLOCKS = 2000
_names = spark.range(0, n, numPartitions=64).select(
    F.col("id"),
    (F.col("id") % N_BLOCKS).cast("string").alias("blk"),
    F.expr("concat('person ', pmod(xxhash64(id, 1), 300), ' of house ',"
           " pmod(xxhash64(id, 2), 500))").alias("name"),
)

# host edge list for HITS: 50k hosts, one edge per row, dense-ish core
_edges = spark.range(0, n, numPartitions=64).select(
    F.concat(F.lit("h"), (F.pmod(F.xxhash64("id", F.lit(1)), 50000))
             .cast("string")).alias("src"),
    F.concat(F.lit("h"), (F.pmod(F.xxhash64("id", F.lit(2)), 50000))
             .cast("string")).alias("dst"),
).filter(F.col("src") != F.col("dst"))

# wide table for profiling: 6 mixed-type columns
_wide = spark.range(0, n, numPartitions=64).select(
    F.col("id"),
    (F.pmod(F.xxhash64("id", F.lit(3)), 1000000)).alias("a"),
    (F.pmod(F.xxhash64("id", F.lit(4)), 97) / 7.0).alias("b"),
    F.when(F.col("id") % 13 == 0, None)
     .otherwise(F.pmod(F.xxhash64("id", F.lit(5)), 500)).alias("c"),
    F.concat(F.lit("cat"), (F.col("id") % 40).cast("string")).alias("d"),
    (F.col("id") % 2 == 0).alias("e"),
)

FNS = {{
    "jvm_control_explode_count":
        lambda: docs.select(F.explode(F.split("text", " ")).alias("t"))
                .filter(F.col("t") != "").agg(F.count("*")).head(),
    "boilerplate_line_df": lambda: line_df_boilerplate(
        _lined, group_col="source", max_doc_frac=0.5)
        .agg(F.sum("n_lines_removed"), F.count("*")).head(),
    "generalize_to_k": lambda: generalize_to_k(_quasi, "id", _ladder, k=8)
        .groupBy("gen_level").count().collect(),
    "jw_blocked_pairs": lambda: blocked_jw_pairs(
        _names, id_col="id", text_col="name", block="blk",
        min_sim=0.86, max_block=10_000_000)
        .agg(F.count("*")).head(),
    "tfidf_cosine": lambda: tfidf_cosine_topk_per_source(
        docs, ["w1", "w17", "w4242"], k=5).collect(),
    "hits_8_rounds": lambda: hits(_edges, iterations=8)
        .agg(F.sum("hub"), F.sum("auth")).head(),
    "profile_table": lambda: profile_table(_wide).collect(),
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


def run(cores: int, n: int, job: str, reps: int) -> dict:
    script = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), str(n), job, str(reps)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = base * 4
    t_base: dict[str, float] = {}
    t_hi: dict[str, float] = {}
    sizes = {j: n_docs for j in JOBS}
    # scan-bound jobs at 8x so fixed overhead doesn't swamp the signal;
    # the 8-round HITS iteration at 4x (per-round work is small, the
    # barrier amortizes with edge count — web_scale.py lesson); the JW
    # name relation at ~n/3 (pair count, not row count, is the work:
    # 2000 blocks x ~65-row blocks = ~4M kernel pairs)
    sizes["jvm_control_explode_count"] = n_docs * 8
    sizes["profile_table"] = n_docs * 8
    sizes["generalize_to_k"] = n_docs * 4
    sizes["hits_8_rounds"] = n_docs * 4
    sizes["jw_blocked_pairs"] = max(n_docs // 3, 10_000)
    for job in JOBS:
        # paired back-to-back so the box's throttle drift hits both sides
        r_hi = run(hi, sizes[job], job, 3)
        r_lo = run(base, sizes[job], job, 3)
        t_hi[job], t_base[job] = r_hi["best"], r_lo["best"]
        print(f"{job}: {base}c {t_base[job]}s  {hi}c {t_hi[job]}s  "
              f"eff {t_base[job] / (4 * t_hi[job]):.3f}", flush=True)

    eff = {j: round(t_base[j] / (4 * t_hi[j]), 3) for j in JOBS}
    engine_min = min(v for j, v in eff.items() if j not in CONTROLS)
    rec = {
        "n_docs": n_docs, "job_sizes": sizes,
        "base_cores": base,
        "times_base": t_base, "times_4x": t_hi, "efficiency": eff,
        "control_efficiency": eff["jvm_control_explode_count"],
        "min_engine_efficiency": engine_min,
    }
    with open(os.path.join(REPO, "BENCH", "linkprof_scale.json"), "w") as f:
        json.dump(rec, f, indent=1)

    rows = "\n".join(
        f"| {j} | {sizes[j]:,} | {t_base[j]} | {t_hi[j]} | {eff[j]}"
        f"{' (control)' if j in CONTROLS else ''} |"
        for j in JOBS
    )
    md = f"""# Linkage/privacy/profiling/graph family scaling (N vs 4N cores)

Input: generated pure-codegen fixtures (docs x 40 words from a 50k
vocab; line-structured docs with per-source footers; a 25x5-class
quasi-identifier table; a 2000-block name relation whose JW pair count
is fixed by construction; a 50k-host edge list). Paired back-to-back
runs per job, best of 3, local[{base}] vs local[{hi}]. Same box
caveats as BENCH/BASELINE.md: the JVM-codegen control bounds what this
shared-DRAM VM can evidence in the same window.

| job | rows | {base}c secs | {hi}c secs | efficiency |
|---|---|---|---|---|
{rows}

boilerplate_line_df: three narrow digest exchanges (distinct -> df agg
-> drop-set join back) + the grouped rebuild fold. generalize_to_k:
three count-windows over shrinking remainders (the ladder).
jw_blocked_pairs: block self-join + length prefilter feeding the
Arrow-batched Python kernel — pair count pinned by block layout so the
kernel work is parallelism-invariant. tfidf_cosine: ONE corpus-wide
(doc,term) count collapsing to per-doc norms + |terms|-bounded scoring.
hits_8_rounds: 16 half-steps of (node, double) exchanges with scalar L2
norms — the serial per-round barrier is the known iterative-job cost
(amortizes with edge count, see WEB_SCALE.md sized pair).
profile_table: one aggregate carrying every per-column statistic incl.
three exact countDistincts.
"""
    with open(os.path.join(REPO, "BENCH", "LINKPROF_SCALE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"metric": "linkprof family min engine efficiency",
                      "value": engine_min, "unit": "ratio",
                      "detail": eff}))


if __name__ == "__main__":
    main()
