"""Edge-case unit tests for functions/text.py (VERDICT r1 item 6).

Each case runs the Spark builder AND its DuckDB sql_* twin on the same
input so the shared-semantics contract (registry docstring) is pinned
at the unit level too: empty strings, all-stopword docs, URLs,
unicode, and token-length boundaries.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from bc_proj3_spark.functions import text as T

CASES = [
    "",                                         # empty
    "   ",                                      # whitespace only
    "the and for are was not",                  # all stopwords
    "a ab abc abcd",                            # length boundary (keep > 2)
    "Visit https://example.com/x?q=1 now!",     # URL stripping
    "Solar.Wind;Power",                         # punctuation between words
    "Ünïcodé tëxt détecteur naïve café",        # accented letters
    "MiXeD CaSe TOKENS Spark SPARK spark",      # case folding + distinct
    "numbers 123 42x x42 007",                  # digit handling
    "rt not-a-retweet prefix",                  # no leading-rt semantics here
]


def _spark_vals(spark, expr_builder, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    return [r[0] for r in df.select(expr_builder(F.col("text"))).collect()]


def _duck_vals(sql_expr, texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in texts])
    return [r[0] for r in con.execute(f"SELECT {sql_expr} FROM t").fetchall()]


def test_clean_text_parity(spark):
    s = _spark_vals(spark, T.clean_text, CASES)
    d = _duck_vals(T.sql_clean_text("text"), CASES)
    assert s == d


def test_tokenize_parity_and_rules(spark):
    s = _spark_vals(spark, T.tokenize, CASES)
    d = _duck_vals(T.sql_tokenize("text"), CASES)
    assert s == d
    by_case = dict(zip(CASES, s))
    assert by_case[""] == []
    assert by_case["   "] == []
    assert by_case["the and for are was not"] == []  # stopwords removed
    assert by_case["a ab abc abcd"] == ["abc", "abcd"]  # strict > 2 chars
    assert all("http" not in tok for tok in by_case["Visit https://example.com/x?q=1 now!"])
    # punctuation → space: words never fuse (the documented deviation)
    assert by_case["Solar.Wind;Power"] == ["solar", "wind", "power"]


def test_fingerprint_parity_and_order_insensitivity(spark):
    s = _spark_vals(spark, T.fingerprint, CASES)
    d = _duck_vals(T.sql_fingerprint("text"), CASES)
    assert s == d
    # order-insensitive: permuted words share a fingerprint
    pair = ["solar wind power grid", "grid power wind solar"]
    fp = _spark_vals(spark, T.fingerprint, pair)
    assert fp[0] == fp[1]
    # repeated words collapse (distinct token set)
    trip = ["solar solar wind", "wind solar"]
    fp2 = _spark_vals(spark, T.fingerprint, trip)
    assert fp2[0] == fp2[1]


def test_unicode_tokens_survive_cleaning(spark):
    # non-ASCII letters are outside [a-z0-9] and become separators —
    # the ASCII-corpus contract; pin it so a future change is deliberate
    toks = _spark_vals(spark, T.tokenize, ["Ünïcodé tëxt café"])[0]
    assert toks == _duck_vals(T.sql_tokenize("text"), ["Ünïcodé tëxt café"])[0]


@pytest.mark.parametrize("null_input", [None])
def test_null_text_yields_null_not_error(spark, null_input):
    df = spark.createDataFrame([(null_input,)], "text string")
    row = df.select(
        T.clean_text(F.col("text")).alias("c"),
        T.tokenize(F.col("text")).alias("tk"),
        T.fingerprint(F.col("text")).alias("fp"),
    ).collect()[0]
    assert row["c"] is None and row["tk"] is None
