"""Property-based tests (hypothesis): the Catalyst decode transforms agree
with pure-Python reference models on arbitrary messy input.

Each example generates a batch of raw strings and runs ONE Spark job over
the batch (per-row jobs would be prohibitively slow), comparing against the
Python model element-wise.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from olap_sus_spark.operators import transforms as tr

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

raw_str = st.one_of(
    st.none(),
    st.text(alphabet="0123456789", max_size=6),
    st.text(alphabet="0123456789abcXYZ*. -", max_size=10),
    st.just(""),
    st.just("  "),
)


def _run(spark, values, expr):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r.o for r in df.select(expr(F.col("s")).alias("o")).collect()]


def _lpad(s: str, n: int, c: str) -> str:
    """Spark lpad: pads to n, TRUNCATES to first n chars if longer."""
    return s[:n] if len(s) >= n else c * (n - len(s)) + s


def model_normalize_hhmm(s):
    if s is None:
        return "00:00:00"
    p = _lpad(s, 4, "0")
    if p == "0000" or p > "2359" or not re.fullmatch(r"[0-9]{4}", p):
        return "00:00:00"
    return f"{p[:2]}:{p[2:]}:00"


@given(st.lists(raw_str, min_size=1, max_size=50))
@settings(**SETTINGS)
def test_normalize_hhmm(spark, vals):
    assert _run(spark, vals, tr.normalize_hhmm) == [model_normalize_hhmm(v) for v in vals]


def model_coded_age(s):
    if s is None:
        return None
    p = _lpad(s, 3, "0")
    unit = int(p[0]) if p[0].isdigit() else None
    # value parses under ANSI cast lexical rules (trim + optional sign) —
    # '4-0' decodes to 0, matching the reference's plain cast (found by
    # hypothesis)
    tail = p[1:3].strip()
    val = int(tail) if re.fullmatch(r"[+-]?[0-9]+", tail) else None
    if unit is None:
        return None
    if unit < 4:
        return 0
    if unit == 4:
        return val
    if unit == 5:
        return None if val is None else val + 100
    return None


@given(st.lists(raw_str, min_size=1, max_size=50))
@settings(**SETTINGS)
def test_decode_coded_age(spark, vals):
    assert _run(spark, vals, tr.decode_coded_age) == [model_coded_age(v) for v in vals]


def model_municipality_key6(s):
    if s is None or s.strip() == "":
        return None
    # Spark's string->int cast trims surrounding whitespace and accepts an
    # optional sign (ANSI cast lexical rules) — found by hypothesis with '0 '.
    head = s[:6].strip()
    return int(head) if re.fullmatch(r"[+-]?[0-9]+", head) else None


@given(st.lists(raw_str, min_size=1, max_size=50))
@settings(**SETTINGS)
def test_municipality_key6(spark, vals):
    assert _run(spark, vals, tr.municipality_key6) == [
        model_municipality_key6(v) for v in vals
    ]


def model_clean_icd10(s):
    if s is None:
        return None
    return re.sub("X$", "", re.sub("[^A-Z0-9]", "", s))


@given(st.lists(raw_str, min_size=1, max_size=50))
@settings(**SETTINGS)
def test_clean_icd10(spark, vals):
    assert _run(spark, vals, tr.clean_icd10) == [model_clean_icd10(v) for v in vals]


def model_decode(s, mapping):
    return mapping.get(s, "Ignorado")


@given(st.lists(st.one_of(raw_str, st.sampled_from(["1", "2", "3", "4", "5"])), min_size=1, max_size=50))
@settings(**SETTINGS)
def test_decode_ladder(spark, vals):
    got = _run(spark, vals, lambda c: tr.decode(c, tr.RACA))
    assert got == [model_decode(v, tr.RACA) for v in vals]


def model_null_normalize(s):
    return None if s is None or s.strip() == "" else s


@given(st.lists(raw_str, min_size=1, max_size=50))
@settings(**SETTINGS)
def test_null_normalize(spark, vals):
    assert _run(spark, vals, tr.null_normalize) == [model_null_normalize(v) for v in vals]
