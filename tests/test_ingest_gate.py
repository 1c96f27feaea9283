"""The live web-ingest gate (streaming/ingest.py): the brief's full
composition — WARC → HTTP split → sniff → HTML main-text → lang-id →
Gopher → trained-KN perplexity gate → embedding → IVF-PQ delta append
— proven batch == stream row-for-row, with every gate's reject class
planted in the fixture (bad status, non-HTML bytes, wrong language,
too-short junk, high-perplexity gibberish)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from snapflow_spark.functions.kn_lm import train_kn_ngram
from snapflow_spark.sources.warc import read_warc, write_warc
from snapflow_spark.streaming import run_stream_to_batch, web_ingest_gate

GOOD = [
    "The river steamer arrived early in the morning and the passengers "
    "walked down to the old market where traders sold fresh bread, "
    "smoked fish, and baskets of ripe fruit. A young clerk recorded "
    "every sale in a leather notebook while his brother counted coins "
    "behind the wooden counter. By noon the square was quiet again and "
    "only the gulls remained, circling above the empty stalls in the "
    "warm coastal wind of late summer.",
    "Engineers tested the new bridge for three weeks before opening it "
    "to traffic, measuring how the steel cables stretched under heavy "
    "loads and how the concrete piers settled into the soft ground. "
    "The final report concluded that the structure could carry twice "
    "the expected weight, and the mayor cut a blue ribbon while a "
    "small crowd cheered from the northern bank of the river under a "
    "clear autumn sky that promised an early frost.",
    "Astronomers at the mountain observatory spent the winter mapping "
    "faint galaxies near the edge of the visible universe, collecting "
    "light that had traveled for billions of years before reaching "
    "their silver mirrors. Each clear night added thousands of images "
    "to the archive, and by spring the team had assembled a catalog "
    "that doubled the number of known sources in that distant region "
    "of the sky, a result that surprised even the oldest researcher.",
]
DE = (
    "Der alte Fischer ging am Morgen zum Hafen und die Boote lagen "
    "still im Nebel. Das Wasser war ruhig und ist selten so klar "
    "gewesen, und der Wind kam leise von der See. Die Kinder liefen "
    "am Ufer entlang und das Licht der Sonne fiel durch die Wolken "
    "auf die nassen Steine, und der Tag begann langsam und warm und "
    "die Stadt erwachte hinter den alten Mauern des Hafens und das "
    "Leben nahm seinen gewohnten Lauf wie an jedem anderen Tag dort."
)
# long enough (>=60 chars, one prose block) to SURVIVE main-text
# extraction, but under Gopher's 50-word floor — so it dies at the
# Gopher gate specifically, not earlier
SHORT = (
    "Buy now and click here for the best deals on everything you need "
    "today. This limited offer ends soon so do not wait another minute."
)


def _gibberish() -> str:
    """English-tagged but OOV-dense: passes lang-id and Gopher, gets
    a KN perplexity ~8x the good pages' (deterministic seed)."""
    rng = random.Random(7)
    words = [
        "".join(
            rng.choice("bcdfghjklmnpqrstvwz") + rng.choice("aeiou")
            for _ in range(3)
        )
        for _ in range(60)
    ]
    return "the and " + " ".join(words) + " of to is the and"


def _page(body_txt: str) -> bytes:
    paras = "".join(f"<p>{p}</p>" for p in body_txt.split("\n"))
    return (
        f"<html><head><title>t</title></head><body>{paras}</body></html>"
    ).encode()


def _http(body: bytes, status=200, ctype="text/html; charset=utf-8") -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n\r\n"
    ).encode() + body


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ingest_warc")
    recs = []

    def add(i, payload, uri):
        recs.append(
            (
                {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:doc-{i}>",
                    "WARC-Target-URI": uri,
                    "WARC-Date": "2026-08-15T00:00:00Z",
                    "Content-Type": "application/http; msgtype=response",
                },
                payload,
            )
        )

    for i, t in enumerate(GOOD):
        add(i, _http(_page(t)), f"https://good.example/{i}")
    add(10, _http(_page(GOOD[0]), status=404), "https://gone.example/404")
    add(
        11,
        _http(b"%PDF-1.4 fake pdf bytes", ctype="application/pdf"),
        "https://pdf.example/a",
    )
    add(12, _http(_page(DE)), "https://de.example/seite")
    add(13, _http(_page(SHORT)), "https://junk.example/ad")
    add(14, _http(_page(_gibberish())), "https://weird.example/x")
    # two shards so the stream sees >1 micro-batch unit
    write_warc(str(tmp / "shard-a.warc.gz"), recs[:4])
    write_warc(str(tmp / "shard-b.warc.gz"), recs[4:])
    return tmp


@pytest.fixture(scope="module")
def lm(spark):
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD)], "doc_id bigint, text string"
    )
    return train_kn_ngram(ref, order=2)


EMBED = "snapflow_spark.functions.embed:stub_embed_batch"


def _gate(df, lm):
    return web_ingest_gate(
        df, lm=lm, ppl_max=100.0, embed_model=EMBED, embed_dim=32
    )


def _key_rows(df):
    return {
        (
            r.doc_id,
            r.url,
            r.lang,
            r.n_tokens,
            r.ppl,
            round(r.embedding[0], 6),
            len(r.embedding),
        )
        for r in df.collect()
    }


def test_every_gate_fires_and_batch_equals_stream(
    spark, warc_dir, lm, tmp_path
):
    batch = _gate(read_warc(spark, str(warc_dir)), lm)
    got = _key_rows(batch)
    # exactly the three good pages survive: 404/pdf/de/junk/gibberish
    # each died at its own gate
    assert {r[0] for r in got} == {f"<urn:uuid:doc-{i}>" for i in range(3)}
    assert all(r[2] == "en" and r[4] <= 100.0 and r[6] == 32 for r in got)

    stream = (
        spark.readStream.format("warc").option("path", str(warc_dir)).load()
    )
    out = run_stream_to_batch(
        _gate(stream, lm),
        output_mode="append",
        checkpoint=str(tmp_path / "ckpt_gate"),
    )
    assert _key_rows(out) == got


def test_rejects_die_at_the_right_gate(spark, warc_dir, lm):
    """Peel the gates one at a time and watch each planted reject
    fall out exactly where it should."""
    batch = read_warc(spark, str(warc_dir))
    # no lang/gopher/lm gates: 404 + pdf die at status/sniff
    open_gate = web_ingest_gate(batch, langs=None, gopher_thresholds=False,
                                embed_dim=8)
    ids = {r.doc_id for r in open_gate.select("doc_id").collect()}
    assert ids == {f"<urn:uuid:doc-{i}>" for i in (0, 1, 2, 12, 13, 14)}
    # langs=() means keep-all too (the YAML builtin's `langs: []`
    # contract) — NOT isin([]), which silently drops every row
    empty_gate = web_ingest_gate(batch, langs=(), gopher_thresholds=False,
                                 embed_dim=8)
    assert {r.doc_id for r in empty_gate.select("doc_id").collect()} == ids
    # lang gate alone removes the German page
    lang_gate = web_ingest_gate(batch, gopher_thresholds=False, embed_dim=8)
    ids = {r.doc_id for r in lang_gate.select("doc_id").collect()}
    assert ids == {f"<urn:uuid:doc-{i}>" for i in (0, 1, 2, 13, 14)}
    # gopher removes the short ad; KN removes the gibberish
    full = _gate(batch, lm)
    ids = {r.doc_id for r in full.select("doc_id").collect()}
    assert ids == {f"<urn:uuid:doc-{i}>" for i in (0, 1, 2)}
    # the gibberish page scored ~8x the good pages
    scored = web_ingest_gate(batch, lm=lm, ppl_max=1e9, embed_dim=8)
    ppl = {r.doc_id: r.ppl for r in scored.select("doc_id", "ppl").collect()}
    good_max = max(
        v for k, v in ppl.items() if k != "<urn:uuid:doc-14>"
    )
    assert ppl["<urn:uuid:doc-14>"] > 4 * good_max


def test_lm_requires_frozen_threshold(spark, warc_dir, lm):
    with pytest.raises(ValueError, match="ppl_max"):
        web_ingest_gate(read_warc(spark, str(warc_dir)), lm=lm)


def test_stream_appends_into_saved_ivfpq_index(spark, warc_dir, lm, tmp_path):
    """The full live-ingest composition: the curated stream delta-
    appends into a SAVED IVF-PQ index via foreachBatch — the standing
    index absorbs stream batches at delta cost and searches see the
    new documents."""
    import numpy as np

    from snapflow_spark.functions.embed import stub_embed_batch
    from snapflow_spark.operators.similarity import IVFPQIndex

    seed_texts = [
        (f"seed-{i}", f"seed document number {i} about topic {i % 5}")
        for i in range(30)
    ]
    seeds = spark.createDataFrame(
        [
            (d, [float(x) for x in stub_embed_batch([t])[0]])
            for d, t in seed_texts
        ],
        "doc_id string, embedding array<float>",
    )
    idx = IVFPQIndex.build(
        seeds, k_cells=2, m=4, n_codes=8, id_col="doc_id", train_sample=64
    )
    path = str(tmp_path / "ivfpq")
    idx.save(path)
    assert IVFPQIndex.load(spark, path, id_col="doc_id").coded.count() == 30

    stream = (
        spark.readStream.format("warc").option("path", str(warc_dir)).load()
    )
    curated = _gate(stream, lm)
    q = (
        curated.select("doc_id", "embedding")
        .writeStream.foreachBatch(
            lambda b, _id: IVFPQIndex.append_to_saved(
                b.sparkSession, path, b, id_col="doc_id"
            )
            if not b.isEmpty()
            else None
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_append"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    after = IVFPQIndex.load(spark, path, id_col="doc_id")
    assert after.coded.count() == 33
    ids = {r.doc_id for r in after.coded.select("doc_id").collect()}
    assert {f"<urn:uuid:doc-{i}>" for i in range(3)} <= ids
    # a probe embedded from a good page's text retrieves an ingested
    # page, not a seed: the stream rows are LIVE in the standing index
    probe = spark.createDataFrame(
        [
            (
                "p0",
                [float(x) for x in stub_embed_batch([GOOD[1]])[0]],
            )
        ],
        "probe_id string, embedding array<float>",
    )
    top = after.search(probe, k=1, nprobe=2).collect()[0]
    assert str(top.doc_id).startswith("<urn:uuid:doc-")


def test_live_ingest_example_yaml(spark, warc_dir, lm, tmp_path):
    """examples/live_ingest.yaml end-to-end: the whole gate chain as
    ONE core.ingest_gate node over the incremental warc: source, with
    the trained-KN artifact loaded from disk."""
    from pathlib import Path

    import yaml

    from snapflow_spark.plans import load_graph

    lm_path = str(tmp_path / "ref.kn.json")
    lm.save(lm_path)
    text = (
        Path(__file__).resolve().parents[1] / "examples" / "live_ingest.yaml"
    ).read_text()
    cfg = yaml.safe_load(
        text.replace("{WARC_DIR}", str(warc_dir))
        .replace("{WAREHOUSE}", str(tmp_path / "wh"))
        .replace("{LM_PATH}", lm_path)
    )
    g = load_graph(cfg)
    assert g.produce(spark) > 0
    rows = g.read(spark, "curated").collect()
    assert {r.doc_id for r in rows} == {
        f"<urn:uuid:doc-{i}>" for i in range(3)
    }
    assert all(
        r.lang == "en" and r.ppl <= 100.0 and len(r.embedding) == 32
        for r in rows
    )


def test_yaml_empty_langs_disables_the_gate(spark, warc_dir, tmp_path):
    """core.ingest_gate langs: [] keeps every language — an empty
    allowlist that filtered everything would be a silent
    pipeline-killer."""
    from snapflow_spark.plans import load_graph

    cfg = {
        "warehouse": str(tmp_path / "wh_langs"),
        "sources": [{"name": "crawl", "warc": str(warc_dir),
                     "types": "response"}],
        "nodes": [
            {
                "name": "curated",
                "function": "core.ingest_gate",
                "upstream": "crawl",
                "params": {"langs": [], "gopher": False, "dim": 8},
            }
        ],
    }
    g = load_graph(cfg)
    assert g.produce(spark) > 0
    langs = {r.lang for r in g.read(spark, "curated").collect()}
    assert "de" in langs and "en" in langs
