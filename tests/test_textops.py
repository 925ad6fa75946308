

def test_script_mix_classification(spark):
    import pandas as pd

    from bloomine_spark.operators.textops import script_mix

    rows = [
        {"doc_id": 1, "text": "hello world"},
        {"doc_id": 2, "text": "привет мир"},
        {"doc_id": 3, "text": "hello привет"},          # latin 5 vs cyr 6
        {"doc_id": 4, "text": "你好世界"},
        {"doc_id": 5, "text": "12345 !!"},               # no script chars
        {"doc_id": 6, "text": "γειά κόσμος مرحبا עולם"},  # 3-way mix
        {"doc_id": 7, "text": "ひらがな カタカナ"},       # kana
        {"doc_id": 8, "text": "한국어 문장"},             # hangul
        {"doc_id": 9, "text": "नमस्ते दुनिया"},            # devanagari
    ]
    out = {r["doc_id"]: r for r in
           script_mix(spark.createDataFrame(pd.DataFrame(rows))).collect()}
    assert out[1]["dominant_script"] == "latin"
    assert out[1]["dominant_frac"] == 1.0
    assert out[2]["dominant_script"] == "cyrillic"
    assert out[3]["dominant_script"] == "cyrillic"
    assert out[3]["n_latin"] == 5 and out[3]["n_cyrillic"] == 6
    assert out[3]["dominant_frac"] == round(6 / 11, 6)
    assert out[4]["dominant_script"] == "cjk" and out[4]["n_cjk"] == 4
    assert out[5]["dominant_script"] == "none"
    assert out[5]["dominant_frac"] is None and out[5]["n_script"] == 0
    assert out[6]["n_greek"] == 10 and out[6]["n_arabic"] == 5
    assert out[6]["n_hebrew"] == 4
    assert out[7]["dominant_script"] == "kana"
    assert out[8]["dominant_script"] == "hangul"
    assert out[9]["dominant_script"] == "devanagari"


def test_script_mix_zero_exchange_plan(spark):
    import pandas as pd

    from bloomine_spark.operators.textops import script_mix

    df = spark.createDataFrame(pd.DataFrame([{"doc_id": 1, "text": "x"}]))
    plan = (
        script_mix(df)._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
