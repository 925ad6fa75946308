"""Entity-resolution / record-linkage operators: fingerprint keys,
blocked edit-distance pairs, pair→cluster→canonical resolution."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.linkage import (
    blocked_edit_pairs,
    fingerprint_clusters,
    fingerprint_key,
    resolve_entities,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_fingerprint_key_normalizes(spark):
    got = (
        spark.range(1)
        .select(
            fingerprint_key(
                F.lit("  The,, QUICK--brown FOX!! fox the ")
            ).alias("k")
        )
        .head()[0]
    )
    # lowercase, punct stripped, token-sorted, token-deduped
    assert got == "brown fox quick the"


def test_fingerprint_clusters_collide_on_noise(spark):
    df = _df(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "Gamma, BETA alpha!"),  # same fingerprint
            (3, "alpha beta delta"),
        ],
    )
    out = {r["id"]: r for r in fingerprint_clusters(df).collect()}
    assert out[1]["fingerprint"] == out[2]["fingerprint"]
    assert out[1]["cluster_size"] == 2 and out[3]["cluster_size"] == 1
    assert out[2]["canonical_id"] == 1
    assert out[1]["keep"] and not out[2]["keep"] and out[3]["keep"]


def test_blocked_edit_pairs_plants_and_threshold(spark):
    df = _df(
        spark,
        [
            (1, "goldenrod lavender spring"),
            (2, "goldenrod lavender sprint"),  # dist 1, same first word
            (3, "goldenrod lavender xyzzy plugh"),  # dist > 2
            (4, "blue steel"),
            (5, "blue steel"),  # exact dup -> dist 0
        ],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in blocked_edit_pairs(df, max_dist=2).collect()
    }
    assert pairs == {(1, 2): 1, (4, 5): 0}


def test_blocked_edit_pairs_cross_block_missed(spark):
    # dist 1 but the edit hits the blocking token -> documented miss
    df = _df(spark, [(1, "alpha beta"), (2, "alphx beta")])
    assert blocked_edit_pairs(df, max_dist=2).count() == 0


def test_blocked_edit_pairs_block_cap_raises(spark):
    # "aaa" is each text's min token -> every row lands in one block
    df = _df(spark, [(i, f"aaa hot text row{i}") for i in range(30)])
    with pytest.raises(ValueError, match="max_block"):
        blocked_edit_pairs(df, max_dist=2, max_block=10)


def test_blocked_edit_pairs_custom_block_column(spark):
    df = spark.createDataFrame(
        [(1, "abc", "k"), (2, "abd", "k"), (3, "abe", "other")],
        ["doc_id", "text", "blk"],
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in blocked_edit_pairs(df, block="blk", max_dist=1).collect()
    }
    assert got == {(1, 2)}


def test_resolve_entities_transitive(spark):
    # A~B and B~C must land in ONE group of 3 with min-id canonical
    df = _df(
        spark,
        [
            (1, "node one"),
            (2, "node one x"),
            (3, "node one xy"),
            (4, "unrelated thing"),
        ],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], ["id_a", "id_b"]
    )
    out = {r["doc_id"]: r for r in resolve_entities(df, pairs).collect()}
    assert (
        out[1]["group_id"] == out[2]["group_id"] == out[3]["group_id"] == 1
    )
    assert out[1]["group_size"] == 3
    assert out[1]["keep"] and not out[2]["keep"] and not out[3]["keep"]
    assert out[4]["group_size"] == 1 and out[4]["keep"]


def test_resolve_entities_quality_survivor(spark):
    df = spark.createDataFrame(
        [(1, "a", 0.1), (2, "b", 0.9), (3, "c", 0.5)],
        ["doc_id", "text", "q"],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    out = {
        r["doc_id"]: r["keep"]
        for r in resolve_entities(df, pairs, quality_col="q").collect()
    }
    assert out == {1: False, 2: True, 3: False}


def test_jaro_winkler_kernel_vs_duckdb_fuzz():
    """The kernel contract: byte-identical semantics to DuckDB's
    jaro_winkler_similarity (greedy window matching, t = half the
    out-of-order matches, boost only above jaro 0.7, prefix cap 4) —
    this equality is what lets the driver oracle call the builtin."""
    import random

    import duckdb

    from bloomine_spark.operators.linkage import jaro_winkler

    con = duckdb.connect()
    rng = random.Random(123)
    alpha = "abcdefg "
    for _ in range(1500):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))).strip()
        if rng.random() < 0.5 and a:
            b = list(a)
            for _ in range(rng.randint(1, 3)):
                op = rng.randint(0, 2)
                if op == 0 and b:
                    b[rng.randrange(len(b))] = rng.choice(alpha)
                elif op == 1:
                    b.insert(rng.randint(0, len(b)), rng.choice(alpha))
                elif op == 2 and len(b) > 1:
                    i = rng.randrange(len(b) - 1)
                    b[i], b[i + 1] = b[i + 1], b[i]
            b = "".join(b).strip()
        else:
            b = "".join(
                rng.choice(alpha) for _ in range(rng.randint(0, 12))
            ).strip()
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == pytest.approx(want, abs=1e-12), (a, b)


def test_jaro_winkler_known_values():
    from bloomine_spark.operators.linkage import jaro_winkler

    # Winkler's own canonical pairs
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111111111)
    assert jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133333333333332)
    assert jaro_winkler("duane", "dwayne") == pytest.approx(0.84)
    # boost threshold: jaro 0.5 with prefix 2 stays unboosted
    assert jaro_winkler("abcdefgh", "abzzzzzz") == pytest.approx(0.5)
    assert jaro_winkler("", "abc") == 0.0
    assert jaro_winkler("", "") == 0.0
    assert jaro_winkler("ab", "ba") == 0.0  # window 0: no cross matches


def test_blocked_jw_pairs_threshold_and_blocking(spark):
    from bloomine_spark.operators.linkage import blocked_jw_pairs

    rows = [
        {"doc_id": 1, "text": "margaret johnson"},
        {"doc_id": 2, "text": "margaret jonson"},    # close: jw high
        {"doc_id": 3, "text": "marmalade jar"},      # same block, far
        {"doc_id": 4, "text": "margaret johnsen"},   # close: jw high
        {"doc_id": 5, "text": "zebra"},              # other block
    ]
    # first-letter blocking: the default (first fingerprint token) would
    # split johnson/jonson since the fingerprint token-sorts
    out = blocked_jw_pairs(
        spark.createDataFrame(pd.DataFrame(rows)),
        block=F.substring("text", 1, 1), min_sim=0.9,
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jw"] for r in out}
    assert (1, 2) in got and got[(1, 2)] > 0.95
    assert (1, 4) in got and got[(1, 4)] > 0.95
    assert all(3 not in p for p in got)


def test_blocked_jw_pairs_length_prefilter_no_loss(spark):
    # the 5s-4 length-ratio prune is a NECESSARY condition: running with
    # and without blocking-compatible lengths must agree with brute force
    from bloomine_spark.operators.linkage import blocked_jw_pairs, jaro_winkler

    rows = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["alpha beta", "alpha betaz", "alpha", "alphabet soup kitchen",
         "alpha bets", "alpha beta "]
    )]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {
        (r["id_a"], r["id_b"])
        for r in blocked_jw_pairs(df, min_sim=0.9).collect()
    }
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if jaro_winkler(rows[i]["text"], rows[j]["text"]) >= 0.9:
                want.add((i, j))
    assert got == want


def test_blocked_jw_pairs_validation(spark):
    from bloomine_spark.operators.linkage import blocked_jw_pairs

    df = spark.createDataFrame(pd.DataFrame([{"doc_id": 1, "text": "x"}]))
    with pytest.raises(ValueError, match="min_sim"):
        blocked_jw_pairs(df, min_sim=0.0)


def _ref_soundex(name):
    codes = {}
    for grp, d in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                   ("L", "4"), ("MN", "5"), ("R", "6"),
                   ("AEIOUY", "0"), ("HW", "7")):
        for ch in grp:
            codes[ch] = d
    s = [ch for ch in name.upper() if "A" <= ch <= "Z"]
    if not s:
        return None
    digits = [codes[ch] for ch in s]
    d2 = [d for d in digits if d != "7"]          # H/W transparent
    collapsed = []
    for d in d2:
        if not collapsed or collapsed[-1] != d:
            collapsed.append(d)
    tail = collapsed if s[0] in "HW" else collapsed[1:]
    tail = [d for d in tail if d != "0"]
    return s[0] + "".join(tail[:3]).ljust(3, "0")


def test_soundex_canonical_vector(spark):
    from bloomine_spark.operators.linkage import soundex_key

    cases = {
        "Robert": "R163", "Rupert": "R163",
        "Ashcraft": "A261",     # the H/W-transparency rule (else A226)
        "Ashcroft": "A261",
        "Tymczak": "T522", "Pfister": "P236", "Jackson": "J250",
        "Washington": "W252", "Hubert": "H163",
        "margaret johnson": "M626",
        "": None, "123": None,
    }
    df = spark.createDataFrame(
        pd.DataFrame({"name": list(cases)})
    ).select("name", soundex_key("name").alias("sx"))
    got = {r["name"]: r["sx"] for r in df.collect()}
    for name, want in cases.items():
        assert got[name] == want, name
        if want is not None:
            assert _ref_soundex(name) == want, name  # reference agrees


def test_soundex_fuzz_vs_reference(spark):
    import random

    from bloomine_spark.operators.linkage import soundex_key

    rng = random.Random(99)
    alpha = "abcdefghijklmnopqrstuvwxyz '-"
    names = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 15)))
        for _ in range(400)
    ]
    df = spark.createDataFrame(pd.DataFrame({"name": names})).select(
        "name", soundex_key("name").alias("sx")
    )
    for r in df.collect():
        assert r["sx"] == _ref_soundex(r["name"]), repr(r["name"])


def test_phonetic_blocking_catches_spelling_variants(spark):
    from bloomine_spark.operators.linkage import blocked_jw_pairs, soundex_key

    rows = [
        {"doc_id": 1, "text": "jonathan smithers"},
        {"doc_id": 2, "text": "jonathon smythers"},  # vowel respellings
        {"doc_id": 3, "text": "bartholomew quist"},
    ]
    out = blocked_jw_pairs(
        spark.createDataFrame(pd.DataFrame(rows)),
        block=soundex_key("text"), min_sim=0.85,
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert (1, 2) in got   # same soundex block despite 3 letter edits
    assert all(3 not in p for p in got)
