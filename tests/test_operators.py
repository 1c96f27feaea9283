"""Snapflow-parity operator tests (SURVEY.md §5.2(2), FIXTURES.md §B) —
static literal record fixtures through each framework op, asserting
exact rows, mirroring snapflow's testing/utils.py harness [P].
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from snapflow_spark.operators import (
    asof_join,
    dedupe_keep_latest,
    grouped_topk,
    merge_streams,
    schema_translate,
    sql_snap,
    topk,
)

TX_SCHEMA = "id bigint, customer string, amount double, updated_at timestamp"


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def tx_chunks(spark):
    """FIXTURES.md fixture tx_log: 3 overlapping chunks, unique_on=[id]."""
    c1 = spark.createDataFrame(
        [
            (1, "alice", 10.0, _ts("2024-01-01T00:00:00")),
            (2, "bob", 20.0, _ts("2024-01-01T01:00:00")),
            (3, "carol", 30.0, _ts("2024-01-01T02:00:00")),
        ],
        TX_SCHEMA,
    )
    c2 = spark.createDataFrame(
        [
            (2, "bob", 25.0, _ts("2024-01-02T00:00:00")),
            (4, "dave", 40.0, _ts("2024-01-02T01:00:00")),
        ],
        TX_SCHEMA,
    )
    c3 = spark.createDataFrame(
        [
            (1, "alice", 15.0, _ts("2024-01-03T00:00:00")),
            (5, "erin", 50.0, _ts("2024-01-03T01:00:00")),
        ],
        TX_SCHEMA,
    )
    return [c1, c2, c3]


def test_accumulate_appends_history(tx_chunks):
    acc = merge_streams(*tx_chunks)
    assert acc.count() == 7


def test_dedupe_keep_latest(tx_chunks):
    acc = merge_streams(*tx_chunks)
    latest = dedupe_keep_latest(
        acc, keys=["id"], order_by=[F.col("updated_at").desc()]
    )
    rows = {r.id: (r.amount, r.updated_at) for r in latest.collect()}
    assert len(rows) == 5
    assert rows[1][0] == 15.0  # chunk3 wins over chunk1
    assert rows[2][0] == 25.0  # chunk2 wins over chunk1
    assert rows[3][0] == 30.0


def test_dedupe_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.0, _ts("2024-01-01T00:00:00")),
            (1, "b", 2.0, _ts("2024-01-01T00:00:00")),  # same key+ts
        ],
        TX_SCHEMA,
    )
    latest = dedupe_keep_latest(
        df, keys=["id"], order_by=[F.col("updated_at").desc(), F.col("amount").desc()]
    )
    assert latest.collect()[0].customer == "b"


def test_merge_streams_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id bigint, a string")
    b = spark.createDataFrame([(2, "y")], "id bigint, b string")
    merged = merge_streams(a, b)
    rows = {r.id: (r.a, r.b) for r in merged.collect()}
    assert rows[1] == ("x", None) and rows[2] == (None, "y")


def test_schema_translate_pair(spark):
    """FIXTURES.md schema_translate_pair: pure rename/cast, row-identical."""
    src = spark.createDataFrame(
        [("alice", 10.5), ("bob", 20.0)], "full_name string, amt double"
    )
    out = schema_translate(
        src,
        mapping={"customer": "full_name", "amount": "amt"},
        casts={"amount": "double"},
    )
    assert out.columns == ["customer", "amount"]
    assert {tuple(r) for r in out.collect()} == {("alice", 10.5), ("bob", 20.0)}


def test_sql_snap_binds_inputs(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 7.0)], "k bigint, v double")
    out = sql_snap(
        spark,
        "SELECT SUM(v) AS total FROM {input_table}",
        inputs={"my_input": df},
        params={"input_table": "my_input"},
    )
    assert out.collect()[0].total == 12.0


def test_asof_join_backward_with_exact_match(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T00:00:00")),
            (1, 101, _ts("2024-01-01T02:00:00")),
            (2, 102, _ts("2024-01-01T01:00:00")),  # no prior right row
        ],
        "user_id bigint, event_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), 1.0, 900),  # exact-ts match for event 100
            (1, _ts("2024-01-01T01:00:00"), 2.0, 901),
            (2, _ts("2024-01-01T03:00:00"), 9.0, 902),  # after left's event -> no match
        ],
        "user_id bigint, ts timestamp, value double, rid bigint",
    )
    out = asof_join(
        left,
        right,
        keys=["user_id"],
        left_ts="ts",
        payload={"value": "last_value"},
        right_order="rid",
    )
    got = {r.event_id: r.last_value for r in out.collect()}
    assert got == {100: 1.0, 101: 2.0, 102: None}


def test_asof_join_tie_break_on_right_order(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T01:00:00"))],
        "user_id bigint, event_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), 5.0, 1),
            (1, _ts("2024-01-01T00:00:00"), 6.0, 2),  # same ts, higher rid wins
        ],
        "user_id bigint, ts timestamp, value double, rid bigint",
    )
    out = asof_join(
        left, right, keys=["user_id"], left_ts="ts",
        payload={"value": "v"}, right_order="rid",
    )
    assert out.collect()[0].v == 6.0


def test_topk_and_grouped_topk(spark):
    df = spark.createDataFrame(
        [(g, i, float(i * (g + 1))) for g in range(2) for i in range(5)],
        "g int, i int, score double",
    )
    top2 = topk(df, [F.col("score").desc(), F.col("i")], 2)
    assert [(r.g, r.i) for r in top2.collect()] == [(1, 4), (1, 3)]
    per_group = grouped_topk(df, ["g"], [F.col("score").desc(), F.col("i")], 2)
    # Spark 4 plans the rank filter as WindowGroupLimit: partial top-k
    # BEFORE the shuffle (only k rows/group/partition move at scale)
    from snapflow_spark.plans.introspect import plan_text

    assert "WindowGroupLimit" in plan_text(per_group)
    got = sorted((r.g, r.i) for r in per_group.collect())
    assert got == [(0, 3), (0, 4), (1, 3), (1, 4)]


def test_salted_join_matches_plain_join(spark):
    """Salting must not change join semantics — compare against the
    plain join on a skewed dataset (90% of rows share one key)."""
    from snapflow_spark.operators.skew import salted_count_by_key, salted_join

    left = spark.createDataFrame(
        [(1 if i < 90 else i, f"v{i}") for i in range(100)], "k long, v string"
    )
    right = spark.createDataFrame([(k, k * 10) for k in range(100)], "k long, w long")

    plain = {(r.k, r.v, r.w) for r in left.join(right, ["k"], "inner").collect()}
    salted = {(r.k, r.v, r.w) for r in salted_join(left, right, ["k"]).collect()}
    assert salted == plain

    plain_left = {(r.k, r.v, r.w) for r in left.join(right.where("k < 5"), ["k"], "left").collect()}
    salted_left = {(r.k, r.v, r.w) for r in salted_join(left, right.where("k < 5"), ["k"], "left").collect()}
    assert salted_left == plain_left

    counts = {r.k: r.n for r in salted_count_by_key(left, ["k"]).collect()}
    assert counts[1] == 90 and sum(counts.values()) == 100


def test_partitioned_parquet_sink_prunes(spark, tmp_path):
    """Partitioned sink: partition dirs exist and a partition-filtered
    read scans only the matching directory (pruning verified via the
    input_file_name of surviving rows)."""
    import pyspark.sql.functions as F

    from snapflow_spark.sources.io import read_parquet, write_parquet_partitioned

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i)) for i in range(20)],
        "id long, grp string, v double",
    )
    out = str(tmp_path / "part_table")
    write_parquet_partitioned(df, out, ["grp"])
    assert sorted(p.name for p in (tmp_path / "part_table").glob("grp=*")) == [
        "grp=a",
        "grp=b",
    ]
    back = read_parquet(spark, out).where(F.col("grp") == "a")
    files = {r[0] for r in back.select(F.input_file_name()).distinct().collect()}
    assert back.count() == 10
    assert all("grp=a" in f for f in files)  # only the pruned dir is read


def test_python_udtf_sentence_split(spark):
    """Spark 4 python UDTF: row -> many rows via SQL LATERAL."""
    from snapflow_spark.functions.udtfs import SplitSentences, register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "One. Two! Three?"), (2, ""), (3, "Just one")],
        "doc_id long, text string",
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT doc_id, s.sent_idx, s.sentence "
        "FROM udtf_docs, LATERAL split_sentences(text) s ORDER BY doc_id, sent_idx"
    ).collect()
    assert [(r.doc_id, r.sent_idx, r.sentence) for r in rows] == [
        (1, 0, "One."),
        (1, 1, "Two!"),
        (1, 2, "Three?"),
        (3, 0, "Just one"),
    ]
    # direct table-function call form
    direct = SplitSentences(F.lit("A. B.")).collect()
    assert [r.sentence for r in direct] == ["A.", "B."]


def test_banded_range_join_matches_naive(spark):
    """Banded rewrite must equal the naive theta join for any band
    width, including intervals spanning many bands and NULLs."""
    from snapflow_spark.operators.rangejoin import banded_range_join

    pts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.5, 10.0, 99.9, 100.0, 250.0, -5.0])]
        + [(99, None)],
        "pid long, v double",
    )
    ivs = spark.createDataFrame(
        [(1, 0.0, 1.0), (2, 5.0, 150.0), (3, 99.95, 100.05), (4, -10.0, -1.0), (5, None, 5.0)],
        "iid long, lo double, hi double",
    )
    naive = {
        (r.pid, r.iid)
        for r in pts.join(ivs, pts.v.between(ivs.lo, ivs.hi)).collect()
    }
    for w in (0.5, 7.0, 1000.0):
        banded = {
            (r.pid, r.iid)
            for r in banded_range_join(
                pts, ivs, point=pts.v, lo=ivs.lo, hi=ivs.hi, band_width=w
            ).collect()
        }
        assert banded == naive, w


def test_expectations_single_pass_and_quarantine(spark):
    from snapflow_spark.operators.quality import (
        check_expectations,
        in_range,
        matches,
        not_null,
        one_of,
        quarantine,
        unique_key_check,
    )

    df = spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "en"),
            (2, None, 5.0, "en"),          # null email
            (3, "bad-email", -2.0, "xx"),  # bad email, range, lang
            (4, "d@x.com", 7.0, "de"),
        ],
        "id long, email string, score double, lang string",
    )
    exps = [
        not_null("email"),
        matches("email", r"^[^@]+@[^@]+$"),
        in_range("score", lo=0.0),
        one_of("lang", ["en", "de", "fr"]),
    ]
    report = check_expectations(df, exps)
    assert report["rows"] == 4
    assert report["email_not_null_failures"] == 1
    assert report["email_matches_failures"] == 1  # NULL passes matches
    assert report["score_in_range_failures"] == 1
    assert report["lang_one_of_failures"] == 1

    passed, failed = quarantine(df, exps)
    assert {r.id for r in passed.collect()} == {1, 4}
    fails = {r.id: set(r.failed_checks) for r in failed.collect()}
    assert fails[2] == {"email_not_null"}
    assert fails[3] == {"email_matches", "score_in_range", "lang_one_of"}

    assert unique_key_check(df, ["id"]) == 0
    assert unique_key_check(df.union(df), ["id"]) == 4


def test_asof_join_null_payload_not_skipped(spark):
    """A matching right row whose payload value is legitimately NULL
    must yield NULL — not an older non-null value carried forward
    (merge_asof / ASOF JOIN semantics). All payload columns must come
    from the SAME right row."""
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01T02:00:00"))],
        "user_id bigint, event_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), 5.0, "old", 1),
            (1, _ts("2024-01-01T01:00:00"), None, "new", 2),  # latest match
        ],
        "user_id bigint, ts timestamp, value double, tag string, rid bigint",
    )
    out = asof_join(
        left,
        right,
        keys=["user_id"],
        left_ts="ts",
        payload={"value": "v", "tag": "t"},
        right_order="rid",
    ).collect()[0]
    assert out.v is None  # NOT 5.0 from the older row
    assert out.t == "new"  # both payload fields from the same right row


def test_quarantine_null_predicate_counts_as_failure(spark):
    """A predicate evaluating to NULL must route the row to `failed`
    (and count as a failure) — rows must never vanish from the split."""
    from snapflow_spark.operators.quality import (
        Expectation,
        check_expectations,
        quarantine,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -1.0)], "id long, score double"
    )
    # deliberately null-unsafe custom predicate: NULL score -> NULL
    exps = [Expectation("score_positive", F.col("score") > 0)]
    report = check_expectations(df, exps)
    assert report["rows"] == 3
    assert report["score_positive_failures"] == 2  # NULL counts as failure
    passed, failed = quarantine(df, exps)
    assert {r.id for r in passed.collect()} == {1}
    assert {r.id for r in failed.collect()} == {2, 3}  # row 2 not lost


def test_banded_range_join_rejects_outer(spark):
    from snapflow_spark.operators.rangejoin import banded_range_join

    pts = spark.createDataFrame([(1, 5.0)], "id long, x double")
    ivs = spark.createDataFrame([(1, 0.0, 10.0)], "iid long, lo double, hi double")
    with pytest.raises(ValueError, match="inner"):
        banded_range_join(
            pts, ivs, point=F.col("x"), lo=F.col("lo"), hi=F.col("hi"),
            band_width=5.0, how="left",
        )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    """Randomized parity against pandas merge_asof (the semantics
    snapflow users relied on): backward, exact matches allowed, ties
    broken by the later right row, NULL payloads carried as-is."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    n_l, n_r = 120, 80
    left_pd = pd.DataFrame(
        {
            "user_id": rng.integers(0, 4, n_l),
            "ts": rng.integers(0, 40, n_l),
            "event_id": np.arange(n_l),
        }
    )
    right_pd = pd.DataFrame(
        {
            "user_id": rng.integers(0, 4, n_r),
            "ts": rng.integers(0, 40, n_r),
            "value": np.where(rng.random(n_r) < 0.25, np.nan, rng.random(n_r).round(3)),
            "rid": np.arange(n_r),
        }
    )
    # pandas reference: sorted by (ts, rid) so the LAST exact/prior row
    # per key wins — the same tie-break as right_order="rid"
    expect = pd.merge_asof(
        left_pd.sort_values(["ts", "event_id"]),
        right_pd.sort_values(["ts", "rid"]),
        on="ts",
        by="user_id",
        direction="backward",
    ).set_index("event_id")["value"]

    left = spark.createDataFrame(left_pd, "user_id long, ts long, event_id long")
    right = spark.createDataFrame(right_pd, "user_id long, ts long, value double, rid long")
    out = asof_join(
        left, right, keys=["user_id"], left_ts="ts",
        payload={"value": "value"}, right_order="rid",
    )
    got = {r.event_id: r.value for r in out.collect()}
    assert len(got) == n_l
    for eid, v in expect.items():
        g = got[eid]
        if pd.isna(v):
            assert g is None or (isinstance(g, float) and pd.isna(g)), eid
        else:
            assert g == pytest.approx(v), eid


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """Real JDBC source/sink test against embedded Derby (ships with
    Spark): write a table, read it back as 4 PARALLEL range scans via
    partitionColumn bounds — the shape that matters at scale."""
    from snapflow_spark.sources import read_jdbc
    from snapflow_spark.sources.io import write_jdbc

    url = f"jdbc:derby:{tmp_path}/jdb;create=true"
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    write_jdbc(df, url, "t_roundtrip", mode="overwrite")
    back = read_jdbc(
        spark,
        url,
        "t_roundtrip",
        partitionColumn="k",
        lowerBound="0",
        upperBound="100",
        numPartitions="4",
    )
    assert back.rdd.getNumPartitions() == 4  # parallel range scans
    rows = {r.k: r.v for r in back.collect()}
    assert len(rows) == 100 and rows[7] == 14.0


def test_write_range_sorted_produces_disjoint_rowgroup_stats(spark, tmp_path):
    """The data-skipping layout: files written by write_range_sorted
    carry non-overlapping min/max stats on the sort column, so
    predicate scans can skip whole row groups/files."""
    import glob

    import pyarrow.parquet as pq

    from snapflow_spark.sources.io import write_range_sorted

    df = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    out = str(tmp_path / "sorted")
    write_range_sorted(df, out, ["k"], n_ranges=4)

    ranges = []
    for f in glob.glob(f"{out}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = [md.schema.column(i).name for i in range(md.num_columns)].index("k")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) == 4
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b, ranges  # disjoint: skipping is possible


def test_observe_expectations_piggybacks_on_action(spark):
    """df.observe counters equal check_expectations' dedicated-scan
    numbers, accumulated during the pipeline's own action (a noop
    write) with no extra scan."""
    from snapflow_spark.operators.quality import (
        check_expectations,
        in_range,
        not_null,
        observe_expectations,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 999.0), (4, 5.0)],
        "id bigint, v double",
    )
    exps = [not_null("v"), in_range("v", 0, 100)]
    observed, obs = observe_expectations(df, exps)
    observed.write.format("noop").mode("overwrite").save()  # the action
    got = obs.get
    expect = check_expectations(df, exps)
    assert got == expect
    assert got["rows"] == 4
    assert got["v_not_null_failures"] == 1
    # NULL passes in_range by design (not_null owns null-counting,
    # so a null row isn't double-counted across expectations)
    assert got["v_in_range_failures"] == 1


def test_asof_join_directions_and_tolerance_match_pandas(spark):
    """merge_asof parity oracle: backward/forward/nearest with and
    without tolerance, checked directly against pandas.merge_asof on
    the same data (the library snapflow users called inside snaps)."""
    import numpy as np
    import pandas as pd

    from snapflow_spark.operators.asof import asof_join

    rng = np.random.default_rng(11)
    n_l, n_r = 120, 60
    lpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n_l),
            "ts": rng.integers(0, 500, n_l).astype("int64"),
            "lv": np.arange(n_l),
        }
    ).sort_values("ts").reset_index(drop=True)
    rpdf = pd.DataFrame(
        {
            "k": rng.integers(0, 4, n_r),
            "ts": (rng.integers(0, 250, n_r) * 2).astype("int64"),
            "rv": np.arange(n_r).astype("int64") * 10,
        }
    )
    # merge_asof demands unique-ish sorted input; drop (k, ts) dups so
    # the tie-break convention can't differ between implementations
    rpdf = (
        rpdf.drop_duplicates(["k", "ts"]).sort_values("ts").reset_index(drop=True)
    )
    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 20):
            exp = pd.merge_asof(
                lpdf, rpdf, on="ts", by="k", direction=direction,
                tolerance=tol,
            )
            got = asof_join(
                ldf, rdf, keys=["k"], left_ts="ts",
                payload={"rv": "rv"}, direction=direction, tolerance=tol,
            ).toPandas().sort_values("lv").reset_index(drop=True)
            exp = exp.sort_values("lv").reset_index(drop=True)
            assert got["rv"].equals(exp["rv"]), (
                direction, tol,
                got.loc[got["rv"] != exp["rv"], ["k", "ts"]].head(),
            )


def test_asof_join_tolerance_interval_on_timestamps(spark):
    """INTERVAL-string tolerance on real timestamps: matches farther
    than the gap are voided (NULL payload)."""
    from datetime import datetime, timedelta

    from snapflow_spark.operators.asof import asof_join

    t0 = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0 + timedelta(minutes=m)) for m in (10, 60)], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t0, "old")], "k int, ts timestamp, tag string"
    )
    out = {
        r.ts.minute: r.tag
        for r in asof_join(
            left, right, ["k"], "ts", tolerance="30 minutes"
        ).collect()
    }
    assert out == {10: "old", 0: None}


def test_pyarrow_native_udtf_table_arg_parity(spark):
    """Spark 4.1 arrow_udtf: eval sees whole RecordBatches (true
    vectorized row generation). Spark forbids arrow UDTFs in LATERAL,
    so tokenize_batch takes a TABLE argument and carries the id
    through; its output must match both the plain-UDTF LATERAL form
    and the JVM explode form row-for-row, including NULL/empty text
    and consecutive-delimiter semantics."""
    from snapflow_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b  c"), (2, None), (3, ""), (4, "solo"), (None, "x y")],
        "id long, text string",
    ).createOrReplaceTempView("tokba_docs")
    batch = spark.sql(
        "SELECT * FROM tokenize_batch(TABLE(tokba_docs)) ORDER BY id, tok_idx"
    ).collect()
    # NULL-id rows are dropped by tokenize_batch (documented: the id
    # column must identify the row; a null would NaN-poison the int64
    # rebuild) — filter them from the reference forms for the compare
    lateral = spark.sql(
        "SELECT id, t.tok_idx, t.token FROM tokba_docs, "
        "LATERAL split_tokens(text) t WHERE id IS NOT NULL ORDER BY id, tok_idx"
    ).collect()
    exploded = spark.sql(
        "SELECT id, CAST(pos AS int) AS tok_idx, tok AS token FROM tokba_docs "
        "LATERAL VIEW posexplode(split(text, ' ')) AS pos, tok "
        "WHERE id IS NOT NULL ORDER BY id, tok_idx"
    ).collect()
    as_tuples = lambda rows: [(r.id, r.tok_idx, r.token) for r in rows]  # noqa: E731
    assert as_tuples(batch) == as_tuples(lateral) == as_tuples(exploded)
    assert all(t[0] is not None for t in as_tuples(batch))
    # '' splits to [''], consecutive delimiters produce an empty token
    assert as_tuples(batch)[:4] == [(1, 0, "a"), (1, 1, "b"), (1, 2, ""), (1, 3, "c")]
    assert (3, 0, "") in as_tuples(batch) and all(t[0] != 2 for t in as_tuples(batch))


def test_permissive_scans_quarantine_corrupt_records(spark, tmp_path):
    """round 8 ingest robustness: PERMISSIVE jsonl/csv scans survive
    malformed lines — bad records land in the corrupt column and
    quarantine_corrupt splits them out, instead of the job failing
    (FAILFAST) or silently shrinking (DROPMALFORMED)."""
    from snapflow_spark.sources import (
        quarantine_corrupt,
        read_csv_permissive,
        read_jsonl_permissive,
    )

    jl = tmp_path / "docs.jsonl"
    jl.write_text(
        '{"id": 1, "text": "good one"}\n'
        '{"id": 2, "text": "also good"}\n'
        '{"id": 3, "text": "truncated...\n'          # malformed JSON
        '{"id": "not a number", "text": "bad type"}\n'  # ill-typed field
    )
    df = read_jsonl_permissive(spark, str(jl), "id bigint, text string")
    good, bad = quarantine_corrupt(df)
    assert {r.id for r in good.collect()} == {1, 2}
    assert "_corrupt_record" not in good.columns
    raws = [r._corrupt_record for r in bad.collect()]
    assert len(raws) == 2 and all(raw for raw in raws)
    assert any("truncated" in raw for raw in raws)
    assert any("not a number" in raw for raw in raws)

    cs = tmp_path / "docs.csv"
    cs.write_text(
        "id,n\n"
        "1,10\n"
        "2,not_an_int\n"   # un-castable
        "3,30\n"
    )
    cdf = read_csv_permissive(spark, str(cs), "id bigint, n bigint")
    cgood, cbad = quarantine_corrupt(cdf)
    assert {(r.id, r.n) for r in cgood.collect()} == {(1, 10), (3, 30)}
    assert [r._corrupt_record for r in cbad.collect()] == ["2,not_an_int"]
    # the partial parse rides along for triage (id parsed, n nulled)
    assert cbad.first().id == 2 and cbad.first().n is None


def test_lsh_optimal_bands_properties():
    """optimal_bands: exhaustive-minimum parity via an independent
    error recomputation, S-curve threshold tracks the target, budget
    respected, monotone r in threshold, guards raise."""
    import pytest

    from snapflow_spark.operators.buckets import (
        lsh_candidate_prob,
        lsh_threshold,
        optimal_bands,
    )

    def err(b, r, t, w=0.5, steps=1000):
        fp = fn = 0.0
        for k in range(steps + 1):
            s = k / steps
            ww = 0.5 if k in (0, steps) else 1.0
            p = lsh_candidate_prob(s, b, r)
            if s < t:
                fp += ww * p
            else:
                fn += ww * (1.0 - p)
        return (w * fp + (1 - w) * fn) / steps

    for h, t in ((32, 0.3), (64, 0.5), (128, 0.8), (100, 0.6)):
        b, r = optimal_bands(h, t)
        assert b * r <= h and b >= 1 and r >= 1
        e = err(b, r, t)
        for rr in range(1, h + 1):
            bb = h // rr
            if bb < 1:
                break
            assert e <= err(bb, rr, t) + 1e-12, (h, t, bb, rr)
        # the chosen curve's inflection sits near the target
        assert abs(lsh_threshold(b, r) - t) < 0.15

    rs = [optimal_bands(128, t)[1] for t in (0.2, 0.5, 0.8)]
    assert rs == sorted(rs)  # higher threshold -> more rows per band

    with pytest.raises(ValueError):
        optimal_bands(128, 1.5)
    with pytest.raises(ValueError):
        optimal_bands(0, 0.5)


def test_read_binary_files_multimodal_onramp(spark, tmp_path):
    """binaryFile ingest (round 11): a directory of media files
    becomes opaque-binary rows — glob pushes into the LISTING,
    max_bytes filters on catalog length only — and composes straight
    into the multimodal decode family (PPM round-trips bit-exact)."""
    import numpy as np

    from snapflow_spark.multimodal.codec import decode_image_bytes, encode_ppm
    from snapflow_spark.sources import read_binary_files

    rng = np.random.default_rng(7)
    imgs = {}
    for i in range(3):
        arr = rng.integers(0, 256, (4 + i, 5, 3), dtype=np.uint8)
        blob = encode_ppm(arr)
        (tmp_path / f"img_{i}.ppm").write_bytes(blob)
        imgs[f"img_{i}.ppm"] = arr
    (tmp_path / "sidecar.json").write_text("{}")  # must not be listed
    (tmp_path / "huge.ppm").write_bytes(
        encode_ppm(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    )

    df = read_binary_files(
        spark, str(tmp_path), glob="*.ppm", max_bytes=1000
    )
    rows = df.collect()
    names = {r.path.rsplit("/", 1)[-1] for r in rows}
    assert names == set(imgs)  # sidecar not listed, huge filtered
    for r in rows:
        got = decode_image_bytes(bytes(r.content))
        assert (got == imgs[r.path.rsplit("/", 1)[-1]]).all()
        assert r.length == len(bytes(r.content))
    # the catalog length predicate is metadata-only: it must appear
    # in the scan, not as a post-read java filter over content
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "length" in plan


def test_yaml_scan_files_to_image_dedup(spark, tmp_path):
    """core.scan_files (round 11): a directory of image files flows
    through YAML into the perceptual image-dedup builtin — the
    multimodal on-ramp wired end-to-end with zero python glue."""
    import numpy as np

    from snapflow_spark.multimodal.codec import encode_ppm
    from snapflow_spark.plans import load_graph

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    near = base.copy()
    near[0, 0] = (near[0, 0] + 3) % 256  # perceptual dup of base
    far = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    d = tmp_path / "imgs"
    d.mkdir()
    for name, arr in [("a.ppm", base), ("b.ppm", near), ("c.ppm", far)]:
        (d / name).write_bytes(encode_ppm(arr))
    cfg = {
        "warehouse": str(tmp_path / "wh_files"),
        "nodes": [
            {"name": "files", "function": "core.scan_files",
             "params": {"path": str(d), "glob": "*.ppm",
                        "blob_col": "blob"}, "overwrite": True},
            {"name": "ids", "function": "core.sql",
             "upstream": {"files": "files"},
             "params": {"sql": "SELECT row_number() OVER (ORDER BY path) "
                               "AS doc_id, path, blob FROM {files}"},
             "overwrite": True},
            {"name": "dups", "function": "core.image_dedup",
             "upstream": {"input": {"node": "ids", "mode": "reference"}},
             "params": {"max_hamming": 10}, "overwrite": True},
        ],
    }
    g = load_graph(cfg)
    assert g.produce(spark) == 3
    names = {
        r.doc_id: r.path.rsplit("/", 1)[-1]
        for r in g.read(spark, "ids").collect()
    }
    pairs = {
        frozenset((names[r.id_a], names[r.id_b]))
        for r in g.read(spark, "dups").collect()
    }
    assert frozenset(("a.ppm", "b.ppm")) in pairs
    assert not any("c.ppm" in p for p in pairs)


def test_read_text_files_both_layouts(spark, tmp_path):
    """Raw-text on-ramp (round 11): per-line shards and per-file docs
    both land as (path, text) with provenance; glob prunes; the YAML
    text mode guards its knobs."""
    import gzip

    import pytest

    from snapflow_spark.plans.yaml_config import _scan_files
    from snapflow_spark.sources import read_text_files

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("doc one line one\ndoc one line two\n")
    (d / "b.txt").write_text("doc two\n")
    (d / "skip.md").write_text("not listed\n")
    # a gz shard inflates transparently
    with gzip.open(d / "c.txt.gz", "wt") as f:
        f.write("zipped line\n")

    lines = read_text_files(spark, str(d), glob="*.txt*").collect()
    assert {r.text for r in lines} == {
        "doc one line one", "doc one line two", "doc two", "zipped line",
    }
    assert all(r.path.startswith("file:") for r in lines)

    whole = read_text_files(spark, str(d), whole=True, glob="*.txt").collect()
    got = {r.path.rsplit("/", 1)[-1]: r.text for r in whole}
    assert got["a.txt"] == "doc one line one\ndoc one line two\n"
    assert got["b.txt"] == "doc two\n"

    # YAML form + guards
    t = _scan_files(spark, str(d), glob="*.txt", text=True, whole=True)
    assert t.count() == 2
    with pytest.raises(ValueError, match="binary form only"):
        _scan_files(spark, str(d), text=True, max_bytes=10)
    with pytest.raises(ValueError, match="text: true only"):
        _scan_files(spark, str(d), whole=True)
