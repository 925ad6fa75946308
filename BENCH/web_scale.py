"""Scaling evidence for the round-6 web front-end family (HTML→text
extraction, URL canonicalize+filter, URL dedup with host cap, anchor
extraction, host-graph PageRank): the same job on the same input at two
parallelism levels (N vs 4N cores — the sandbox stand-in for N vs 4N
executors, north-rule protocol), methodology of BENCH/quality_scale.py
(paired back-to-back subprocesses per job, pinned leaf splits, pinned
GC threads, best-of-reps). Separate record — fingerprinted kernel
campaigns untouched.

Inputs: the shared generated documents fixture wrapped in planted page
markup/URLs (pure codegen, 64 pinned splits); PageRank runs on a
hash-random host graph (xxhash64 endpoints) so the edge set is
formula-dense, not modulus-degenerate.

Writes BENCH/WEB_SCALE.md + BENCH/web_scale.json and prints one JSON
line.

Usage: python BENCH/web_scale.py [n_docs] [base_cores]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOBS = [
    "jvm_control_explode_count",
    "html_extract",
    "url_canon_filter",
    "url_host_cap",
    "link_extract",
    "pagerank",
    "hyperball",
    "line_dedup",
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
                  app_name=f"webscale-{{cores}}-{{job}}",
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

from bloomine_spark.operators.centrality import hyperball_harmonic
from bloomine_spark.operators.dedup import line_dedup
from bloomine_spark.operators.linkgraph import (
    extract_links, host_edges, pagerank)
from bloomine_spark.operators.webops import (
    canonicalize_url_df, html_extract, url_dedup_with_host_cap, url_filter)

d = F.col("doc_id")
# page markup around the real text: head/style to kill, block structure,
# entities, one comment — every stage of the extraction chain does work
_pages = docs.select(
    "doc_id",
    F.concat(
        F.lit("<html><head><title>t</title><style>p{{x}}</style></head>"
              "<body><h1>H</h1><p>"),
        F.col("text"),
        F.lit("</p><!-- c --><ul><li>a&amp;b</li><li>c&nbsp;d</li></ul>"
              "<script>var z='<p>no</p>';</script></body></html>"),
    ).alias("html"),
)
_urls = docs.select(
    "doc_id",
    F.concat(
        F.when(d % 7 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("h"), F.pmod(F.xxhash64(d), 50000).cast("string"),
        F.lit(".Example.com/"),
        F.expr("repeat('a/', cast(doc_id % 15 as int))"),
        F.lit("page"), (d % 1000).cast("string"),
        F.when(d % 13 == 0, F.lit(".jpg")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("?utm_source=x&q=1")).otherwise(F.lit("")),
        F.when(d % 2 == 0, F.lit("#top")).otherwise(F.lit("")),
    ).alias("url"),
)
_linked = docs.select(
    "doc_id",
    F.concat(F.lit("https://h"), F.pmod(F.xxhash64(d), 50000).cast("string"),
             F.lit(".example.com/p")).alias("url"),
    F.concat(
        F.lit('<p>x</p><a href="https://H'),
        F.pmod(F.xxhash64(d, F.lit(1)), 50000).cast("string"),
        F.lit('.Example.com/x">a</a><a href=\'//h'),
        F.pmod(F.xxhash64(d, F.lit(2)), 50000).cast("string"),
        F.lit(".example.com/y#f'>b</a><a href=\"/local/1\">c</a>"),
    ).alias("html"),
)
# hash-random host graph: n_docs*4 directed edges over 200k hosts
_edges = (spark.range(0, n_docs * 4, numPartitions=64).select(
    F.concat(F.lit("h"), F.pmod(F.xxhash64("id"), 200000).cast("string"))
     .alias("src"),
    F.concat(F.lit("h"), F.pmod(F.xxhash64("id", F.lit(1)), 200000)
     .cast("string")).alias("dst")))
# line-dedup fixture: 5-line docs with a planted shared footer on 1/3 of
# docs and a hash-random body (so the digest relation has real dup mass)
_lined = docs.select(
    "doc_id",
    F.concat(
        F.expr("concat_ws(chr(10), transform(sequence(1, 4),"
               " j -> concat('line ', pmod(xxhash64(doc_id, j), 200000))))"),
        F.when(d % 3 == 0, F.lit("\nshared footer line one of many"))
         .otherwise(F.lit("")),
    ).alias("text"),
)

FNS = {{
    "jvm_control_explode_count":
        lambda: docs.select(F.explode(F.split("text", " ")).alias("t"))
                .filter(F.col("t") != "").agg(F.count("*")).head(),
    "html_extract": lambda: html_extract(_pages)
        .agg(F.sum("n_lines"), F.sum(F.length("text"))).head(),
    "url_canon_filter": lambda: url_filter(
        canonicalize_url_df(_urls), blocked_hosts=["h77.example.com"])
        .agg(F.sum(F.col("url_keep").cast("long")),
             F.count("url_reason")).head(),
    "url_host_cap": lambda: url_dedup_with_host_cap(
        canonicalize_url_df(_urls), max_per_host=50)
        .agg(F.sum(F.col("keep").cast("long"))).head(),
    "link_extract": lambda: extract_links(_linked)
        .agg(F.count("*"), F.sum(F.length("link"))).head(),
    "pagerank": lambda: pagerank(_edges, iterations=5)
        .agg(F.sum("pr"), F.count("*")).head(),
    "hyperball": lambda: hyperball_harmonic(_edges, b=8, max_iter=5)
        .agg(F.sum("harmonic_est"), F.count("*")).head(),
    "line_dedup": lambda: line_dedup(_lined)
        .agg(F.sum("n_lines_removed"), F.sum(F.length("text"))).head(),
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
    sizes = {j: n_docs for j in JOBS}
    # the control and the light URL string chains get 8x docs so fixed
    # job overhead does not swamp the scaling signal; the regex-heavy
    # extraction chains carry ~15 regex passes per ~600-char page and
    # run at n_docs; pagerank's size is its edge count (4x docs over
    # 200k hosts), fixed 5 rounds
    for j in ("jvm_control_explode_count", "url_canon_filter",
              "url_host_cap"):
        sizes[j] = n_docs * 8
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
        "job_tokens": {j: sizes[j] * 40 for j in JOBS},
        "base_cores": base,
        "times_base": t_base, "times_4x": t_hi, "efficiency": eff,
        "control_efficiency": eff["jvm_control_explode_count"],
        "min_engine_efficiency": engine_min,
    }
    with open(os.path.join(REPO, "BENCH", "web_scale.json"), "w") as f:
        json.dump(rec, f, indent=1)

    rows = "\n".join(
        f"| {j} | {sizes[j]:,} | {t_base[j]} | {t_hi[j]} | {eff[j]}"
        f"{' (control)' if j in CONTROLS else ''} |"
        for j in JOBS
    )
    md = f"""# Web front-end family scaling (N vs 4N cores)

Input: generated docs x 40 words wrapped in planted page markup / URLs
(pure-codegen fixture, .data parquet, 64 pinned leaf splits); per-job
doc counts below (the control and the light URL chains at 8x so fixed
overhead doesn't swamp the signal; the regex-extraction chains at 1x —
~15 regex passes per ~600-char page is real work by design; pagerank =
{n_docs * 4:,} hash-random edges over 200k hosts, 5 fixed rounds).
Paired back-to-back runs per job, best of 3, local[{base}] vs
local[{hi}]. Same box caveats as BENCH/BASELINE.md: the JVM-codegen
control bounds what this shared-DRAM VM can evidence in the same
window; engine jobs at or above the control add no scaling penalty of
their own.

| job | docs | {base}c secs | {hi}c secs | efficiency |
|---|---|---|---|---|
{rows}

html_extract and link_extract are zero-exchange codegen maps (the
whole chain is regexp_replace/extract inside one WholeStageCodegen
span) — scaling is bounded only by the scan. url_canon_filter is the
same shape over shorter strings. url_host_cap adds the two rank
windows (hash exchange on url_canon, then on host — both
WindowGroupLimit-eligible). pagerank is the iterative shape: per round
one (node,double) exchange onto the statically partitioned edge list
and one partial-aggregated exchange onto dst, plus a 1-row dangling
scalar; rounds are graph-size-independent, so its efficiency is the
per-round shuffle envelope, not a depth artifact.
"""
    with open(os.path.join(REPO, "BENCH", "WEB_SCALE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"metric": "web family min engine efficiency",
                      "value": engine_min, "unit": "ratio",
                      "detail": eff}))


if __name__ == "__main__":
    main()
