"""Script-first language ID (textstats.lang_id_script): per-script
classification, the kana/han Japanese split, the mostly-Latin fallback,
and Spark/DuckDB twin agreement."""

from __future__ import annotations

import duckdb
import pytest

from vector_spark import textstats as T

CASES = [
    ("中文处理系统的性能评估", "zh"),
    ("こんにちは世界のテストです", "ja"),          # kana >= 10% of CJK
    ("漢字漢字漢字漢字漢字漢字漢字漢字漢字の", "zh"),  # 1 kana in 21 CJK -> zh
    ("한국어 텍스트 테스트", "ko"),
    ("это русский текст", "ru"),
    ("اختبار النص العربي", "ar"),
    ("परीक्षण पाठ यहाँ", "hi"),
    ("δοκιμαστικό κείμενο εδώ", "el"),
    ("טקסט בדיקה כאן", "he"),
    ("ทดสอบข้อความที่นี่", "th"),
    # mostly-Latin with sporadic CJK -> stopword fallback ('en': 'the'/'of')
    ("the quick brown fox jumps over the lazy dog of 中文 fame", "en"),
]


def test_lang_id_script_cases(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "i int, text string"
    )
    got = {
        r["i"]: r["lang"]
        for r in df.select("i", T.lang_id_script("text").alias("lang")).collect()
    }
    assert got == {i: lang for i, (_, lang) in enumerate(CASES)}


def test_sql_twin_agrees(spark):
    rows = ", ".join(
        f"({i}, '{t}')" for i, (t, _) in enumerate(CASES)
    )
    sql = (
        f"SELECT i, {T.sql_lang_id_script('text')} AS lang"
        f" FROM (VALUES {rows}) AS v(i, text) ORDER BY i"
    )
    duck = [r[1] for r in duckdb.sql(sql).fetchall()]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "i int, text string"
    )
    spark_out = [
        r["lang"]
        for r in df.select("i", T.lang_id_script("text").alias("lang"))
        .orderBy("i")
        .collect()
    ]
    assert duck == spark_out
