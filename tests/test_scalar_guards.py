"""guarded_try_bigint (queries/scalars.py): the regex-routed try_cast
must be EXACTLY Spark's try_cast — the guard only exists to skip the
per-row formatted-exception cost of a failing TRY cast (round 17),
never to change a value. Pinned over an adversarial grammar set:
signs, embedded/edge whitespace and sub-U+0020 control chars, int64
boundary and overflow values, decimal/scientific/hex/unicode-digit
forms, and NULL."""

from __future__ import annotations

from pyspark.sql import functions as F

from snapflow_spark.queries.scalars import guarded_try_bigint

ADVERSARIAL = [
    "O", "F", "P",
    "42", "+42", "-42", "0042", "0", "-0",
    " 42 ", "\t42\n", " +42", "\x0142", "42\x01", "\x0b42", "\x0c42",
    "\r42", "\x0042",
    "- 42", "--42", "++42", "+-42", "4 2", "4_2",
    "4.5", "4.", ".5", "42e3", "0x2A", "inf", "NaN", "",
    "9223372036854775807", "9223372036854775808",
    "-9223372036854775808", "-9223372036854775809",
    "99999999999999999999999",
    " 42", "42 ",  # NBSP is NOT trimmed by the cast
    "٤٢", "４２",  # arabic-indic / fullwidth digits: cast rejects
    None,
]


def test_guarded_try_bigint_equals_raw_try_cast(spark):
    df = spark.createDataFrame([(s,) for s in ADVERSARIAL], "s string")
    rows = df.select(
        "s",
        F.col("s").try_cast("bigint").alias("raw"),
        guarded_try_bigint("s").alias("guarded"),
    ).collect()
    for r in rows:
        assert r.raw == r.guarded, (r.s, r.raw, r.guarded)
    # the boundary values really parse (the guard must not eat them)
    by_s = {r.s: r.guarded for r in rows}
    assert by_s["9223372036854775807"] == 2**63 - 1
    assert by_s["-9223372036854775808"] == -(2**63)
    assert by_s["9223372036854775808"] is None  # overflow -> NULL, no error
