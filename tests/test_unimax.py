"""UniMax waterfill (Chung 2023): iterative-waterfill python replay vs
the closed-form relational plan, budget conservation, epoch-cap
respect, uniform uncapped level, and the budget-unreachable edge."""

from __future__ import annotations

import pytest

from bloomine_spark.operators.mixture import unimax_plan


def _ref_waterfill(toks, max_epochs, budget):
    caps = {s: max_epochs * t for s, t in toks.items()}
    remaining = sorted(caps, key=lambda s: (caps[s], s))
    b, alloc = budget, {}
    while remaining:
        share = b / len(remaining)
        s = remaining[0]
        if caps[s] < share:
            alloc[s] = float(caps[s])
            b -= caps[s]
            remaining.pop(0)
        else:
            for s in remaining:
                alloc[s] = share
            break
    return alloc


def _df(spark, toks):
    rows = []
    i = 0
    for s, t in toks.items():
        # split each source's mass into a few docs to exercise the agg
        parts = [t // 3, t // 3, t - 2 * (t // 3)]
        for p in parts:
            rows.append((i, s, p))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, n_tok long")


TOKS = {"web": 10_000, "wiki": 800, "books": 2_500, "code": 4_000, "tiny": 60}


def test_matches_iterative_waterfill(spark):
    budget = 9_000
    ref = _ref_waterfill(TOKS, 4, budget)
    got = {
        r["source"]: r
        for r in unimax_plan(_df(spark, TOKS), 4, token_budget=budget).collect()
    }
    assert set(got) == set(ref)
    for s in ref:
        assert got[s]["allocated"] == pytest.approx(ref[s], rel=1e-12)
        assert got[s]["tok"] == TOKS[s]
        assert got[s]["capacity"] == 4 * TOKS[s]
        assert got[s]["capped"] == (ref[s] == 4 * TOKS[s])
        assert got[s]["epochs"] == pytest.approx(ref[s] / TOKS[s], rel=1e-12)


def test_budget_conserved_and_level_uniform(spark):
    budget = 9_000
    rows = unimax_plan(_df(spark, TOKS), 4, token_budget=budget).collect()
    assert sum(r["allocated"] for r in rows) == pytest.approx(budget)
    for r in rows:
        assert r["allocated"] <= r["capacity"] + 1e-9
        assert r["epochs"] <= 4 + 1e-12
    levels = {r["allocated"] for r in rows if not r["capped"]}
    assert len(levels) == 1  # uncapped sources share one water level
    # only tiny (cap 240 < level 2190) is capped at this budget; wiki's
    # 3200 cap sits above the post-tiny water level (8760/4)
    capped = {r["source"] for r in rows if r["capped"]}
    assert capped == {"tiny"}


def test_budget_unreachable_all_capped(spark):
    total_cap = 4 * sum(TOKS.values())
    rows = unimax_plan(
        _df(spark, TOKS), 4, token_budget=total_cap + 999
    ).collect()
    assert all(r["capped"] for r in rows)
    assert sum(r["allocated"] for r in rows) == pytest.approx(total_cap)


def test_ratio_budget_is_integer_derived(spark):
    total = sum(TOKS.values())
    rows = unimax_plan(
        _df(spark, TOKS), 4, budget_ratio=(1, 2)
    ).collect()
    assert sum(r["allocated"] for r in rows) == pytest.approx(total // 2)


def test_fairer_than_proportional(spark):
    # the UniMax point: at equal budget, the smallest source gets a far
    # larger share of ITS OWN mass than the web crawl does of its own.
    rows = {
        r["source"]: r
        for r in unimax_plan(_df(spark, TOKS), 4, token_budget=9_000).collect()
    }
    assert rows["tiny"]["epochs"] == 4.0           # taken whole, 4 epochs
    assert rows["web"]["epochs"] < 0.5             # crawl heavily subsampled
