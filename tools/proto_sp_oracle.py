"""Prototype: full SP-score oracle SQL for cascade_combined_scores /
polyfamily_assign_docs (promotion r5-verdict #3). Compares Spark vs DuckDB
at sf0.01 before wiring into __spark_entry__.oracle_sql().
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

MOI_HEAD = "sort slow value"
MOI_TAIL = "big part merge"
PROBE_B1 = "scan key row"


def bigrams(phrase):
    w = phrase.split(" ")
    return [f"{a} {b}" for a, b in zip(w, w[1:])]


def score_cte(name, phrase, docs_cte="tok"):
    """CTE chain computing (doc_id, rc, score) for one 3-word phrase with
    k=2 over the `{docs_cte}` CTE (doc_id, t := token list). Mirrors the
    kernel: FP = >=1 distinct target bigram (fwd, else reversed retry);
    matched windows paint 2-token intervals; fragment DP via prefix sums.
    """
    g1, g2 = bigrams(phrase)
    return f"""
        wf_{name} AS (
          SELECT doc_id, i AS pos,
                 (t[i + 1] || ' ' || t[i + 2]) IN ('{g1}', '{g2}') AS cov
          FROM {docs_cte}, unnest(range(0, len(t) - 1)) AS u(i)
          WHERE len(t) >= 2
        ),
        wr_{name} AS (
          SELECT doc_id, i AS pos,
                 (r[i + 1] || ' ' || r[i + 2]) IN ('{g1}', '{g2}') AS cov
          FROM (SELECT doc_id, list_reverse(t) AS r FROM {docs_cte}),
               unnest(range(0, len(r) - 1)) AS u(i)
          WHERE len(r) >= 2
        ),
        dir_{name} AS (
          SELECT f.doc_id, bool_or(f.cov) AS fwd_fp,
                 bool_or(r.cov) AS rc_fp
          FROM wf_{name} f JOIN wr_{name} r
            ON f.doc_id = r.doc_id AND f.pos = r.pos
          GROUP BY f.doc_id
        ),
        mwin_{name} AS (
          SELECT w.doc_id, FALSE AS rc, w.pos
          FROM wf_{name} w JOIN dir_{name} d ON w.doc_id = d.doc_id
          WHERE d.fwd_fp AND w.cov
          UNION ALL
          SELECT w.doc_id, TRUE AS rc, w.pos
          FROM wr_{name} w JOIN dir_{name} d ON w.doc_id = d.doc_id
          WHERE NOT d.fwd_fp AND d.rc_fp AND w.cov
        ),
        ctok_{name} AS (
          SELECT DISTINCT doc_id, rc, pos + dd.d AS tpos
          FROM mwin_{name}, (VALUES (0), (1)) AS dd(d)
        ),
        runs_{name} AS (
          SELECT doc_id, rc, tpos,
                 tpos - ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY tpos) AS grp
          FROM ctok_{name}
        ),
        frag_{name} AS (
          SELECT doc_id, rc, MIN(tpos) AS fstart, MAX(tpos) AS fend,
                 10 * COUNT(*) AS s
          FROM runs_{name} GROUP BY doc_id, rc, grp
        ),
        pref_{name} AS (
          SELECT doc_id, rc, s,
                 ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY fstart) AS rn,
                 SUM(s - CASE WHEN fstart = first_start THEN 0
                       ELSE 15 + 7 * (fstart - prev_end - 1) - 1 END)
                   OVER (PARTITION BY doc_id ORDER BY fstart) AS q
          FROM (
            SELECT *,
                   LAG(fend) OVER (
                     PARTITION BY doc_id ORDER BY fstart) AS prev_end,
                   MIN(fstart) OVER (PARTITION BY doc_id) AS first_start
            FROM frag_{name}
          )
        ),
        score_{name} AS (
          SELECT doc_id, bool_or(rc) AS rc, MAX(q + mx) AS score
          FROM (
            SELECT doc_id, rc, q,
                   MAX(s - q) OVER (
                     PARTITION BY doc_id ORDER BY rn) AS mx
            FROM pref_{name}
          ) GROUP BY doc_id
        )"""


MST = 19.25  # ScreenParams(k=2) mst for |kset|=2 (exercised Python-side)


def cascade_oracle():
    head = score_cte("h", MOI_HEAD)
    # flank 2 runs ONLY on flank-1 SP survivors (cascade semi-join)
    return f"""
        WITH tok AS (
          SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        {head},
        surv AS (
          SELECT doc_id FROM score_h WHERE score >= {MST}
        ),
        tok2 AS (
          SELECT tok.doc_id, t FROM tok JOIN surv USING (doc_id)
        ),
        {score_cte("t2", MOI_TAIL, "tok2")},
        f1 AS (
          SELECT doc_id,
                 MAX(CASE WHEN NOT rc THEN score END) AS f1_score,
                 MAX(CASE WHEN rc THEN score END) AS f1_rc_score
          FROM score_h GROUP BY doc_id
        ),
        f2 AS (
          SELECT doc_id,
                 MAX(CASE WHEN NOT rc THEN score END) AS f2_score,
                 MAX(CASE WHEN rc THEN score END) AS f2_rc_score
          FROM score_t2 GROUP BY doc_id
        )
        SELECT CAST(COALESCE(f1.doc_id, f2.doc_id) AS VARCHAR) AS doc_id,
               f1_score, f1_rc_score, f2_score, f2_rc_score,
               CAST({MST} AS DOUBLE) AS threshold,
               CASE WHEN GREATEST(f1_score, f1_rc_score) >= {MST}
                     AND GREATEST(f2_score, f2_rc_score) >= {MST}
                    THEN 1 ELSE 0 END AS pass
        FROM f1 FULL OUTER JOIN f2 USING (doc_id)
    """


def polyfamily_oracle():
    return f"""
        WITH tok AS (
          SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
        ),
        {score_cte("h", MOI_HEAD)},
        {score_cte("t", MOI_TAIL)},
        {score_cte("b", PROBE_B1)},
        probes AS (
          SELECT h.doc_id, 'probeA' AS target_id,
                 h.score + t.score AS total_score
          FROM score_h h JOIN score_t t USING (doc_id)
          WHERE h.score >= {MST} AND t.score >= {MST}
          UNION ALL
          SELECT b.doc_id, 'probeB',
                 b.score + t.score
          FROM score_b b JOIN score_t t USING (doc_id)
          WHERE b.score >= {MST} AND t.score >= {MST}
        ),
        ranked AS (
          SELECT p.*, d.source, ROW_NUMBER() OVER (
            PARTITION BY d.source, p.doc_id
            ORDER BY total_score DESC, target_id ASC) AS rn
          FROM probes p JOIN documents d USING (doc_id)
        )
        SELECT source, CAST(doc_id AS VARCHAR) AS doc_id, target_id,
               CAST(total_score AS BIGINT) AS total_score
        FROM ranked WHERE rn = 1
    """


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from tools.check_correctness import TABLES, value_hash

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )

    spark = SparkSession.builder.master("local[8]").config(
        "spark.sql.shuffle.partitions", "8"
    ).getOrCreate()
    import __spark_entry__ as em

    def canon(pdf):
        pdf = pdf[sorted(pdf.columns)].copy()
        return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)

    for name, oq in (
        ("cascade_combined_scores", cascade_oracle()),
        ("polyfamily_assign_docs", polyfamily_oracle()),
    ):
        got = em.queries()[name](spark, SF).toPandas()
        want = con.sql(oq).df()
        ok_rows = len(got) == len(want)
        hg, hw = value_hash(got), value_hash(want)
        print(f"P {name}: rows {len(got)}/{len(want)} "
              f"hash={'ok' if hg == hw else 'MISMATCH'}", flush=True)
        if hg != hw:
            g, w = canon(got), canon(want)
            both = g.merge(w, how="outer", indicator=True,
                           on=list(g.columns)) if ok_rows else None
            if both is not None:
                print(both[both["_merge"] != "both"].head(20), flush=True)
            else:
                print("spark:", g.head(8), "\noracle:", w.head(8), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
