"""End-to-end engine composition (SURVEY §3 lifecycle): a paged API
feeds a snapshot store; an incremental pipeline dedups, quality-gates
and aggregates it across ticks; the final state equals the one-shot
batch computation — the full connector -> store -> reactive loop ->
north-star-operator story in one test.
"""

import pyspark.sql.functions as F

from snapflow_spark.functions.text import token_count_expr
from snapflow_spark.incremental.pipeline import REFERENCE
from snapflow_spark.operators import exact_dedup
from snapflow_spark.plans import graph
from snapflow_spark.sources import import_api_pages

DOCS = [
    # (doc_id, text, lang) — doc 3 duplicates doc 0's text, doc 7
    # duplicates doc 4's; the quality gate drops the one-word doc 5
    (0, "the quick brown fox jumps over the lazy dog", "en"),
    (1, "der schnelle braune fuchs springt", "de"),
    (2, "one two three four five six seven", "en"),
    (3, "the quick brown fox jumps over the lazy dog", "en"),
    (4, "pack my box with five dozen liquor jugs", "en"),
    (5, "tiny", "en"),
    (6, "sphinx of black quartz judge my vow", "en"),
    (7, "pack my box with five dozen liquor jugs", "en"),
]
SCHEMA = "doc_id bigint, text string, lang string"
MIN_TOKENS = 3


def _expected(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    keep = exact_dedup(df, "text", "doc_id").select("doc_id")
    kept = df.join(keep, "doc_id", "left_semi").where(
        token_count_expr("text") >= MIN_TOKENS
    )
    return {
        r.lang: (r.n_docs, r.total_tokens)
        for r in kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_expr("text").cast("bigint")).alias("total_tokens"),
        )
        .collect()
    }


def test_api_to_curated_stats_incremental_equals_batch(spark, tmp_path):
    g = graph(str(tmp_path / "wh"))
    src = g.source("api_docs")

    def curate(spark, history):
        keep = exact_dedup(history, "text", "doc_id").select("doc_id")
        return history.join(keep, "doc_id", "left_semi").where(
            token_count_expr("text") >= MIN_TOKENS
        )

    def stats(spark, curated):
        return curated.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count_expr("text").cast("bigint")).alias("total_tokens"),
        )

    g.create_node(
        "curated", curate, upstream={"history": ("api_docs", REFERENCE)},
        overwrite=True,
    )
    g.create_node(
        "corpus_stats", stats, upstream={"curated": ("curated", REFERENCE)},
        overwrite=True,
    )

    def pager(cursor, page_size=3):
        start = int(cursor or 0)
        page = DOCS[start : start + page_size]
        return (
            [{"doc_id": i, "text": t, "lang": lg} for i, t, lg in page],
            start + len(page),
        )

    # tick 1: first two pages arrive; pipeline reaches a fixed point
    import_api_pages(spark, pager, SCHEMA, src, max_pages=2)
    assert g.produce(spark) == 2

    # tick 2: the rest arrives (including the duplicates); only the
    # delta is imported, the reference nodes re-fire
    import_api_pages(spark, pager, SCHEMA, src)
    assert g.produce(spark) == 2

    got = {
        r.lang: (r.n_docs, r.total_tokens)
        for r in g.read(spark, "corpus_stats").collect()
    }
    assert got == _expected(spark)
    # dedup really dropped the two copies and the gate dropped 'tiny'
    assert got["en"] == (4, 31)  # docs 0,2,4,6 = 9+7+8+7 tokens
    # nothing new -> fixed point, no node runs
    assert g.produce(spark) == 0


def test_full_curation_chain_incremental_equals_batch(spark, tmp_path):
    """The COMPLETE q_pipeline_docs chain — exact dedup -> quality
    gate -> per-domain cap -> sha256 split -> sequence packing ->
    per-lang stats — run incrementally over ticks must equal the
    one-shot batch. The cap stage is the interesting one: 'at most
    cap docs per domain' is a property of the ACCUMULATED corpus, so
    the node must be REFERENCE over the full history (recompute-on-
    delta-arrival); a per-tick cap admits up to cap docs per domain
    PER TICK and over-admits — demonstrated by the consumable-mode
    control at the end."""
    from snapflow_spark.operators.curation import (
        cap_per_domain,
        pack_sequences,
        split_by_hash,
    )

    # 16 docs, 3 sources; s0 has 7 gated survivors (> cap) spread
    # across both ticks so the accumulated-cap selection must be
    # revised when tick 2 lands; dup pairs span the tick boundary;
    # 'nope' fails the 4-token floor
    def t(i, words, lang, src):
        return (i, " ".join(words), lang, src)

    docs = [
        t(0, ["alpha", "beta", "gamma", "delta", "epsilon"], "en", "s0"),
        t(1, ["zeta", "eta", "theta", "iota"], "en", "s0"),
        t(2, ["kappa", "la", "mu", "nu", "xi"], "de", "s1"),
        t(3, ["omicron", "pi", "rho", "sigma"], "en", "s0"),
        t(4, ["tau", "upsilon", "phi", "chi", "psi"], "en", "s2"),
        t(5, ["nope"], "en", "s0"),
        t(6, ["alef", "bet", "gimel", "dalet"], "de", "s1"),
        t(7, ["he", "vav", "zayin", "het", "tet"], "en", "s0"),
        # --- tick boundary (page size 4, 2 pages per tick) ---
        t(8, ["alpha", "beta", "gamma", "delta", "epsilon"], "en", "s0"),  # dup of 0
        t(9, ["yod", "kaf", "lamed", "mem"], "en", "s0"),
        t(10, ["nun", "samekh", "ayin", "pe"], "en", "s0"),
        t(11, ["tsadi", "qof", "resh", "shin"], "de", "s1"),
        t(12, ["kappa", "la", "mu", "nu", "xi"], "de", "s1"),  # dup of 2
        t(13, ["tav", "aleph", "two", "three", "four"], "en", "s2"),
        t(14, ["five", "six", "seven", "eight"], "en", "s2"),
        t(15, ["nine", "ten", "eleven", "twelve"], "en", "s0"),
    ]
    schema = "doc_id bigint, text string, lang string, source string"
    CAP, FLOOR, FRAC, BUDGET = 3, 4, 0.25, 16

    def curate(spark, history):
        keep = exact_dedup(history, "text", "doc_id").select("doc_id")
        gated = history.join(keep, "doc_id", "left_semi").where(
            token_count_expr("text") >= FLOOR
        )
        capped = cap_per_domain(gated, cap=CAP, domain_col="source")
        return split_by_hash(
            capped.withColumn("n_toks", token_count_expr("text")),
            test_frac=FRAC,
        )

    def stats(spark, curated):
        packed = pack_sequences(
            curated.where(F.col("split") == "train"),
            budget=BUDGET, token_col="n_toks", partition_col="lang",
        )
        bagg = curated.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_toks").cast("bigint")).alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).cast("bigint").alias("n_train"),
        )
        pagg = packed.groupBy("lang").agg(
            F.countDistinct("chunk_id").alias("n_chunks"),
            F.sum(F.col("chunk_spans").cast("int")).cast("bigint").alias("n_spanning"),
        )
        return bagg.join(pagg, "lang", "left").select(
            "lang", "n_docs", "total_tokens", "first_doc", "n_train",
            F.coalesce("n_chunks", F.lit(0)).alias("n_chunks"),
            F.coalesce("n_spanning", F.lit(0)).alias("n_spanning"),
        )

    def batch_stats(rows):
        df = spark.createDataFrame(rows, schema)
        return {tuple(r) for r in stats(spark, curate(spark, df)).collect()}

    g = graph(str(tmp_path / "wh2"))
    src = g.source("api_docs")

    def pager(cursor, page_size=4):
        start = int(cursor or 0)
        page = docs[start : start + page_size]
        return (
            [dict(zip(("doc_id", "text", "lang", "source"), d)) for d in page],
            start + len(page),
        )

    g.create_node(
        "curated", curate, upstream={"history": ("api_docs", REFERENCE)},
        overwrite=True,
    )
    g.create_node(
        "pipe_stats", stats, upstream={"curated": ("curated", REFERENCE)},
        overwrite=True,
    )

    # tick 1: first 8 docs — fixed point must equal batch over tick-1 data
    import_api_pages(spark, pager, schema, src, max_pages=2)
    assert g.produce(spark) == 2
    got1 = {tuple(r) for r in g.read(spark, "pipe_stats").collect()}
    assert got1 == batch_stats(docs[:8])

    # tick 2: the rest (dups + new s0 docs that revise the cap choice)
    import_api_pages(spark, pager, schema, src)
    assert g.produce(spark) == 2
    got2 = {tuple(r) for r in g.read(spark, "pipe_stats").collect()}
    assert got2 == batch_stats(docs)
    # the revision actually happened: tick-1 state is not a subset fix
    assert got1 != got2
    assert g.produce(spark) == 0  # fixed point

    # cap correctness at the store level: no source exceeds CAP
    curated = g.read(spark, "curated")
    per_src = {r.source: r["count"] for r in curated.groupBy("source").count().collect()}
    assert all(n <= CAP for n in per_src.values())
    assert per_src["s0"] == CAP  # s0 genuinely hit the cap

    # CONTROL: a consumable-mode (per-tick delta) cap over-admits —
    # why the cap stage needs the accumulated store, not the tick
    g2 = graph(str(tmp_path / "wh3"))
    src2 = g2.source("api_docs")

    def cap_delta(spark, delta):
        return cap_per_domain(delta, cap=CAP, domain_col="source")

    g2.create_node("capped", cap_delta, upstream={"delta": "api_docs"})
    import_api_pages(spark, pager, schema, src2, max_pages=2)
    g2.produce(spark)
    import_api_pages(spark, pager, schema, src2)
    g2.produce(spark)
    per_src2 = {
        r.source: r["count"]
        for r in g2.read(spark, "capped").groupBy("source").count().collect()
    }
    assert per_src2["s0"] > CAP  # per-tick cap over-admitted s0


def test_dsir_selection_incremental_equals_batch(spark, tmp_path):
    """DSIR selection is a WHOLE-CORPUS property: the raw/target
    bucket models, the totals, and therefore every document's
    importance weight move whenever new data lands — so the selection
    node consumes the accumulated history as REFERENCE and revises
    its picks each tick. Final state == one-shot batch, and the
    tick-1 selection is genuinely revised by tick 2 (a doc selected
    early drops out once better-matching documents arrive)."""
    from snapflow_spark.operators.selection import dsir_select

    dd = [
        (0, "spark shuffle partitions broadcast join plan", "en"),
        (1, "simmer garlic butter in the pan", "en"),
        (2, "catalyst plan rewrites and shuffle pruning", "en"),
        (3, "roast the vegetables with olive oil", "en"),
        (4, "whisk the eggs and fold the flour", "de"),
        (5, "broadcast join avoids the shuffle plan", "de"),
        # --- tick boundary ---
        (6, "spark plan shuffle partitions and pruning", "en"),
        (7, "shuffle plan broadcast partitions spark join", "en"),
        (8, "slow cooked lamb with garlic butter", "de"),
        (9, "partitions pruning plan shuffle spark", "de"),
    ]
    schema = "doc_id bigint, text string, lang string"
    K = 4

    def select(spark, history):
        return dsir_select(
            history, None, K, target_pred=F.col("lang") == "en"
        )

    def batch(rows):
        df = spark.createDataFrame(rows, schema)
        return [tuple(r) for r in select(spark, df).collect()]

    g = graph(str(tmp_path / "wh_dsir"))
    src = g.source("api_docs")

    def pager(cursor, page_size=3):
        start = int(cursor or 0)
        page = dd[start : start + page_size]
        return (
            [dict(zip(("doc_id", "text", "lang"), d)) for d in page],
            start + len(page),
        )

    g.create_node(
        "selected", select, upstream={"history": ("api_docs", REFERENCE)},
        overwrite=True,
    )

    import_api_pages(spark, pager, schema, src, max_pages=2)
    assert g.produce(spark) == 1
    got1 = [tuple(r) for r in g.read(spark, "selected").collect()]
    assert got1 == batch(dd[:6])

    import_api_pages(spark, pager, schema, src)
    assert g.produce(spark) == 1
    got2 = [tuple(r) for r in g.read(spark, "selected").collect()]
    assert got2 == batch(dd)
    assert got1 != got2  # the selection was revised, not appended
    assert g.produce(spark) == 0  # fixed point


def test_crawl_to_training_data_round10(spark, tmp_path):
    """Round-10 composition: the full crawl-to-training-data flow over
    every new piece in one chain — a CDXJ index drives byte-range WARC
    reads; payloads route by sniffed magic bytes; the PDF route
    decrypts an owner-locked file transparently while a
    password-locked one quarantines on the encrypted flag; HTML
    extracts; mixed-encoding text repairs segment-wise; a German
    corpus passes the Gopher gate only under its own stopword list;
    and a byte-level BPE trained on the survivors encodes them
    losslessly for packing."""
    import gzip
    import json

    from snapflow_spark.functions.byte_bpe import train_byte_bpe
    from snapflow_spark.functions.html import html_extract
    from snapflow_spark.functions.normalize import normalize_text_column
    from snapflow_spark.functions.sniff import sniff_format_expr
    from snapflow_spark.multimodal.pdf import make_pdf_bytes, pdf_extract
    from snapflow_spark.operators.curation import pack_sequences
    from snapflow_spark.operators.gopher import gopher_quality_filter
    from snapflow_spark.sources.cc_index import read_cc_cdxj
    from snapflow_spark.sources.warc import (
        read_warc_ranges,
        warc_record_bytes,
    )

    de_words = ["der", "die", "und", "das", "ist", "von", "mit", "auch"] + [
        f"wort{i:02d}" for i in range(52)
    ]
    de_text = "\n".join(
        " ".join(de_words[i : i + 12]) for i in range(0, 60, 12)
    )
    # the mojibake'd rendering of one line (UTF-8 read as cp1252)
    de_html_text = de_text.replace("wort00", "wört00")
    corrupted = de_html_text.encode("utf-8").decode("cp1252")

    pages = {
        "/doc.pdf": make_pdf_bytes(
            [de_text], encrypt="aes-128", owner_password=b"admin"
        ),
        "/locked.pdf": make_pdf_bytes(
            ["should never surface"], encrypt="rc4-128",
            user_password=b"secret",
        ),
        # leading newline exercises the round-10 sniff trim fix
        "/page.html": (
            "\n<!doctype html><html><body><p>"
            + corrupted.replace("\n", "</p><p>")
            + "</p></body></html>"
        ).encode("cp1252"),
    }
    # one member-gzip WARC + its CDXJ index
    recs, lines, off = [], [], 0
    warc_path = tmp_path / "crawl.warc.gz"
    with open(warc_path, "wb") as f:
        for i, (path, body) in enumerate(sorted(pages.items())):
            hdrs = {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:uuid:e2e-{i}>",
                "WARC-Target-URI": f"https://de.example{path}",
                "WARC-Date": "2026-08-15T00:00:00Z",
                "Content-Type": "application/http; msgtype=response",
            }
            payload = b"HTTP/1.1 200 OK\r\n\r\n" + body
            member = gzip.compress(warc_record_bytes(hdrs, payload), mtime=0)
            lines.append(
                f"de,example){path} 2026081500000{i} " + json.dumps({
                    "url": f"https://de.example{path}", "status": "200",
                    "mime": "application/pdf" if path.endswith("pdf")
                    else "text/html",
                    "offset": str(off), "length": str(len(member)),
                    "filename": warc_path.name,
                })
            )
            f.write(member)
            off += len(member)
    (tmp_path / "cdx-0").write_text("\n".join(lines) + "\n")

    # index -> byte-range reads -> sniffed routing
    idx = read_cc_cdxj(spark, str(tmp_path / "cdx-0"), status=200)
    fetched = read_warc_ranges(idx, base_path=str(tmp_path)).select(
        "target_uri",
        F.expr("substring(payload, instr(payload, x'0d0a0d0a') + 4)").alias(
            "body"
        ),
    )
    routed = fetched.select(
        "target_uri", "body", sniff_format_expr("body").alias("fmt")
    )
    fmts = {r.target_uri.rsplit("/", 1)[-1]: r.fmt for r in routed.collect()}
    assert fmts == {
        "doc.pdf": "pdf", "locked.pdf": "pdf", "page.html": "html",
    }

    # PDF route: owner-locked decrypts, password-locked quarantines
    pdfs = pdf_extract(routed.where("fmt = 'pdf'"), body_col="body")
    ok_pdfs = pdfs.where("text IS NOT NULL")
    quarantined = pdfs.where("text IS NULL AND encrypted")
    assert ok_pdfs.count() == 1 and quarantined.count() == 1
    # HTML route + segment mojibake repair restores the corrupted line
    html = html_extract(
        routed.where("fmt = 'html'"),
        body_col="body",
        content_type_col=None,
    ).selectExpr("target_uri", "text")
    html = normalize_text_column(html, form="", fix_encoding="segments")
    docs = ok_pdfs.selectExpr("target_uri AS url", "text").unionByName(
        html.selectExpr("target_uri AS url", "text")
    ).withColumn("doc_id", F.xxhash64("url")).withColumn(
        "lang", F.lit("de")
    )
    assert docs.where(F.col("text").contains("wört00")).count() == 1
    assert docs.where(F.col("text").contains("Ã")).count() == 0

    # per-language Gopher gate: the English list rejects everything,
    # the routed German list keeps both documents
    assert gopher_quality_filter(docs).count() == 0
    kept = gopher_quality_filter(
        docs, stopwords_by_lang={"de": ("der", "die", "und", "das")}
    )
    assert kept.count() == 2

    # byte-BPE on the survivors: lossless encode feeding the packer
    tok = train_byte_bpe(kept, num_merges=50)
    encoded = kept.select(
        "doc_id",
        "text",
        tok.encode_col(spark, "text").alias("toks"),
    )
    for r in encoded.collect():
        assert tok.decode_text(r.toks) == r.text
    packed = pack_sequences(
        encoded.select("doc_id", F.size("toks").alias("n_tokens")),
        budget=64,
        token_col="n_tokens",
        id_col="doc_id",
    )
    assert packed.count() == 2
