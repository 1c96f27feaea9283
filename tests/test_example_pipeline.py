"""examples/cc_pipeline.yaml — the shipped end-to-end crawl-curation
config: incremental WARC ingest → HTML/main-text extraction → URL
filter/dedup → link-graph authority → line dedup → split, every stage
a core.* builtin. The test synthesizes a two-file crawl with planted
spam, duplicate URLs and a cross-doc duplicate line, runs produce()
twice (incremental no-op), drops a third file and produces again."""

from __future__ import annotations

from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _resp(url, html):
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
        + html.encode()
    )
    return (
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:uuid:{abs(hash(url))}>",
            "WARC-Target-URI": url,
            "WARC-Date": "2026-08-14T12:00:00Z",
            "Content-Type": "application/http; msgtype=response",
        },
        payload,
    )


def _pdf_resp(url, page_text):
    """A PDF response whose Content-Type LIES (octet-stream): the
    pipeline's magic-byte router must classify it by bytes."""
    from snapflow_spark.multimodal.pdf import make_pdf_bytes

    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n\r\n"
        + make_pdf_bytes([page_text])
    )
    return (
        {
            "WARC-Type": "response",
            "WARC-Record-ID": f"<urn:uuid:{abs(hash(url))}>",
            "WARC-Target-URI": url,
            "WARC-Date": "2026-08-14T12:00:00Z",
            "Content-Type": "application/http; msgtype=response",
        },
        payload,
    )


ARTICLE = (
    "<div><a href='/'>Home</a> | <a href='/about'>About</a></div>"
    "<p>{body} This sentence pads the paragraph well past the sixty "
    "character main-content threshold for the extractor.</p>"
    "<p>Shared boilerplate line that appears in every single page of "
    "this site and should be line-deduplicated away eventually.</p>"
    "<a href='{link}'>next</a>"
    "<footer>Copyright 2026. All rights reserved.</footer>"
)


def _make_warc(path, records):
    from snapflow_spark.sources.warc import write_warc

    write_warc(str(path), records)


@pytest.fixture()
def crawl_dir(tmp_path):
    d = tmp_path / "drop"
    d.mkdir()
    _make_warc(
        d / "batch1.warc.gz",
        [
            _resp(
                "https://news.example/a",
                ARTICLE.format(body="Alpha article prose.",
                               link="https://blog.example/x"),
            ),
            # same page behind a tracking URL -> url_dedup collapses
            _resp(
                "https://news.example/a?utm_source=feed",
                ARTICLE.format(body="Alpha article prose.",
                               link="https://blog.example/x"),
            ),
            _resp(
                "https://spam-mill.example/buy",
                ARTICLE.format(body="Spam spam casino-bonus.",
                               link="https://news.example/a"),
            ),
        ],
    )
    _make_warc(
        d / "batch2.warc.gz",
        [
            _resp(
                "https://blog.example/x",
                ARTICLE.format(body="Beta article prose entirely different.",
                               link="https://news.example/a"),
            ),
            # served with a LYING octet-stream header: only magic-byte
            # routing gets this to the PDF extractor
            _pdf_resp(
                "https://docs.example/report.pdf",
                "Delta report prose arrives inside of a portable document "
                "and it should survive all of the downstream text gates "
                "with room to spare. The report body reads like prose.",
            ),
        ],
    )
    return d


def test_cc_pipeline_end_to_end(spark, tmp_path, crawl_dir):
    import yaml

    from snapflow_spark.plans import load_graph

    text = (REPO / "examples" / "cc_pipeline.yaml").read_text()
    cfg = yaml.safe_load(
        text.replace("{WARC_DIR}", str(crawl_dir)).replace(
            "{WAREHOUSE}", str(tmp_path / "wh")
        )
    )
    g = load_graph(cfg)
    assert g.produce(spark) > 0

    def latest(name):
        # overwrite-nodes hold exactly one (current) snapshot
        return g.read(spark, name).collect()

    # spam domain + phrase filtered before anything else counts;
    # the sniffer labeled every kept row by its BYTES
    clean = g.read(spark, "clean").collect()
    assert all("spam-mill" not in r.target_uri for r in clean)
    assert len(clean) == 4  # 2x news (tracking variant) + 1 blog + 1 pdf
    fmts = {r.target_uri: r.format for r in clean}
    assert fmts["https://docs.example/report.pdf"] == "pdf"  # header lied
    assert fmts["https://blog.example/x"] == "html"

    # canonical-url dedup collapses the tracking variant
    uniq = latest("unique_urls")
    assert len(uniq) == 3
    by_url = {r.canonical_url: r.n_copies for r in uniq}
    assert by_url["https://news.example/a"] == 2

    # authority over the 2-domain link cycle sums to 1
    ranks = {r.id: r.rank for r in latest("authority")}
    assert set(ranks) == {"news.example", "blog.example"}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9

    # main_text made it into docs; chrome did not; the byte-routed
    # PDF branch converged into the same corpus schema
    docs = {r.url: r.text for r in g.read(spark, "docs").collect()}
    assert any("Alpha article prose" in t for t in docs.values())
    assert all("Home" not in t and "rights reserved" not in t
               for t in docs.values())
    assert "Delta report prose" in docs["https://docs.example/report.pdf"]

    # cross-doc line dedup keeps the shared boilerplate line ONCE
    # the Gopher gate (relaxed word floor for the tiny demo corpus)
    # keeps every real article — nothing here trips the repetition or
    # shape rules, so the battery must not eat the corpus silently
    assert len(g.read(spark, "quality_docs").collect()) == len(
        g.read(spark, "docs").collect()
    )

    dd = latest("split")
    boiler_hits = sum(
        1 for r in dd if "Shared boilerplate line" in (r.text or "")
    )
    assert boiler_hits == 1
    assert {r.split for r in dd} <= {"train", "test"}

    # the INCREMENTAL data card: per-batch partial rows accumulated
    # from deltas, report rolled up from partials alone — doc count
    # matches the full docs corpus without any re-profiling scan
    card = latest("datacard")
    assert len(card) == 1
    assert card[0].n_docs == len(g.read(spark, "docs").collect())
    assert card[0].n_tokens > 0 and 0.0 <= card[0].dup_rate <= 1.0

    # incremental: nothing new -> no-op produce
    assert g.produce(spark) == 0

    # a third file arrives; only it is ingested, downstream recomputes
    _make_warc(
        crawl_dir / "batch3.warc.gz",
        [_resp("https://late.example/z",
               ARTICLE.format(body="Gamma article prose arrives late.",
                              link="https://news.example/a"))],
    )
    assert g.produce(spark) > 0
    assert len(latest("unique_urls")) == 4


# --- examples/multilingual_pipeline.yaml (round 10) ----------------------


def test_multilingual_pipeline_end_to_end(spark, tmp_path):
    """The shipped multilingual example: segment mojibake repair ->
    trained lang routing -> per-lang Gopher/C4 -> byte-BPE counting ->
    temperature balancing -> window chunking, every stage a core.*
    builtin with real trained artifacts."""
    import yaml
    from pyspark.sql import functions as F

    from snapflow_spark.functions.byte_bpe import train_byte_bpe
    from snapflow_spark.operators.langid import train_lang_id
    from snapflow_spark.plans import load_graph

    en_stops = ["the", "be", "to", "of", "and", "that", "have", "with"]
    de_stops = ["der", "die", "und", "das", "ist", "von", "mit", "auch"]

    def doc(stops, prefix, i):
        uniq = [f"{prefix}{i}word{j:02d}" for j in range(52)]
        toks = [*stops, *uniq]
        body = "\n".join(
            " ".join(toks[k : k + 12]) + "." for k in range(0, 60, 12)
        )
        return body

    rows = []
    for i in range(8):
        rows.append((i, "en", doc(en_stops, "en", i)))
    for i in range(8, 12):
        rows.append((i, "de", doc(de_stops, "de", i)))
    # one English doc arrives mojibake'd (UTF-8 read as cp1252) in one
    # span: the segments repair must fix it before lang-id sees it
    englishy = doc(en_stops, "mj", 99).replace("mj99word00", "naïve—start")
    rows.append((99, "en", englishy.encode("utf-8").decode("cp1252")))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.createOrReplaceTempView("ml_docs_example")

    # train the two artifacts the example references
    langid_path = str(tmp_path / "langid.json")
    train_lang_id(df, label_col="lang", iters=12).save(langid_path)
    tok_path = str(tmp_path / "tok.json")
    train_byte_bpe(df, num_merges=60).save(tok_path)

    text = (REPO / "examples" / "multilingual_pipeline.yaml").read_text()
    cfg = yaml.safe_load(
        text.replace("{WAREHOUSE}", str(tmp_path / "wh"))
        .replace("{DOCS_VIEW}", "ml_docs_example")
        .replace("{LANGID_MODEL}", langid_path)
        .replace("{TOKENIZER}", tok_path)
    )
    g = load_graph(cfg)
    assert g.produce(spark) > 0

    # the mojibake'd doc survived (repaired, then recognized as en)
    routed = g.read(spark, "routed").collect()
    assert {r.lang_pred for r in routed} == {"en", "de"}
    fixed = [r for r in routed if r.doc_id == 99]
    assert len(fixed) == 1 and "naïve—start" in fixed[0].text
    # per-lang stopword routing kept BOTH languages (the English-only
    # list would have rejected every German doc)
    quality = g.read(spark, "quality").collect()
    assert {r.lang_pred for r in quality} == {"en", "de"}
    # balancing: alpha=0 -> roughly equal token mass per language
    bal = (
        g.read(spark, "balanced")
        .groupBy("lang_pred")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    shares = {r.lang_pred: r.t for r in bal}
    total = sum(shares.values())
    assert abs(shares["de"] / total - 0.5) < 0.15
    # contexts: every chunk fits the window and carries provenance
    ctx = g.read(spark, "contexts").collect()
    assert ctx and all(r.chunk_n_tokens <= 32 for r in ctx)
    assert any(r.chunk_idx > 0 for r in ctx)  # long docs actually split


# --- examples/semantic_curation.yaml (round 11) ---------------------------


def test_semantic_curation_pipeline_end_to_end(spark, tmp_path):
    """The shipped round-11 example: trained-KN perplexity gate ->
    import-path model embeddings -> D4 dedup+diversify -> curated
    join-back, every stage a core.* builtin with real artifacts."""
    import yaml

    from snapflow_spark.functions.kn_lm import train_kn_bigram
    from snapflow_spark.plans import load_graph

    # reference corpus: fluent "english-like" word chains the KN LM
    # learns; tail docs will break the chains
    ref_rows = [
        "the cat sat on the mat and the dog ran in the park",
        "the dog sat on the rug and the cat ran in the house",
        "a cat ran in the park and a dog sat on the mat",
    ] * 4
    ref = spark.createDataFrame([(t,) for t in ref_rows], "text string")
    lm_path = str(tmp_path / "kn.json")
    train_kn_bigram(ref, modified=True).save(lm_path)

    # the embedder module (shipped via addPyFile): vector depends only
    # on the doc's FIRST word -> same-head docs are exact semantic dups
    mod = tmp_path / "curation_embedder.py"
    mod.write_text(
        "import hashlib\n"
        "import numpy as np\n\n"
        "def embed_batch(texts):\n"
        "    out = np.zeros((len(texts), 8))\n"
        "    for i, t in enumerate(texts):\n"
        "        head = (t.split() or [''])[0]\n"
        "        seed = int.from_bytes(hashlib.sha256(head.encode()).digest()[:4], 'big')\n"
        "        out[i] = np.random.default_rng(seed).normal(size=8)\n"
        "    return out\n"
    )
    spark.sparkContext.addPyFile(str(mod))

    rows = [
        (0, "the cat sat on the mat"),        # fluent, head 'the'
        (1, "the dog ran in the park"),       # fluent, head 'the' (dup of 0 semantically)
        (2, "a dog sat on the rug"),          # fluent, head 'a'
        (3, "mat park rug dog cat on in a"),  # scrambled -> ppl tail
        (4, "zz qq ww ee rr tt yy uu"),       # OOV garbage -> ppl tail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("sem_docs_example")

    text = (REPO / "examples" / "semantic_curation.yaml").read_text()
    cfg = yaml.safe_load(
        text.replace("{WAREHOUSE}", str(tmp_path / "wh_sem"))
        .replace("{DOCS_VIEW}", "sem_docs_example")
        .replace("{KN_LM}", lm_path)
        .replace("{EMBED_MODEL}", "curation_embedder:embed_batch")
    )
    g = load_graph(cfg)
    assert g.produce(spark) > 0

    gated = {r.doc_id for r in g.read(spark, "gated").collect()}
    assert {0, 1, 2} <= gated  # fluent docs pass the ppl gate
    # the p80 cutoff over 5 docs drops exactly the worst-ppl doc,
    # which is one of the two junk docs (scrambled vs OOV — their
    # relative ppl depends on the continuation floor, both far above
    # the fluent three)
    assert len(gated) == 4 and not {3, 4} <= gated
    emb = g.read(spark, "embedded").collect()
    assert all(len(r.embedding) == 8 for r in emb)
    decisions = {r.doc_id: r.is_kept for r in g.read(spark, "decisions").collect()}
    curated = {r.doc_id for r in g.read(spark, "curated").collect()}
    # docs 0 and 1 embed identically (same head word): at most one
    # survives the SemDeDup collapse into the curated output
    assert len(curated & {0, 1}) <= 1
    assert curated == {d for d, kept in decisions.items() if kept}
