"""WAT metadata — the third member of the Common Crawl triple
(WARC raw captures, WET extracted text, WAT per-record metadata).

WAT files are ordinary WARC framing (``warc-type: metadata``,
``content-type: application/json``) whose payloads are JSON envelopes
describing the corresponding WARC record: target URI, HTTP headers,
page title, outlinks. Pipelines that only need the LINK GRAPH read
WAT instead of WARC — ~10× less data than re-parsing HTML — so this
module supports both directions against the published Common Crawl
envelope layout (``Envelope.WARC-Header-Metadata`` +
``Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata``):

- ``parse_wat`` — metadata records → (target_uri, title, links)
  columns via ``from_json`` with a PARTIAL schema (Spark ignores the
  envelope fields we don't declare — no python, pure codegen, and a
  WAT row that isn't valid JSON yields NULLs, not a dead job).
- ``wat_payload_expr`` / ``write_wat_shards`` — the generation
  direction: build the same envelope with ``to_json(struct(...))``
  (codegen) from ``html_extract``'s output and shard it through the
  distributed WARC writer as ``metadata`` records.

Scale: parse is map-only JVM-side JSON; generation is map-only
expression work + the foreachPartition shard writer. The link graph
composes directly: ``link_graph_edges(parse_wat(read_warc(...)))``.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

#: Partial Common Crawl WAT envelope — only the fields we consume;
#: from_json ignores everything else in the payload.
WAT_SCHEMA = StructType(
    [
        StructField(
            "Envelope",
            StructType(
                [
                    StructField(
                        "WARC-Header-Metadata",
                        StructType(
                            [StructField("WARC-Target-URI", StringType())]
                        ),
                    ),
                    StructField(
                        "Payload-Metadata",
                        StructType(
                            [
                                StructField(
                                    "HTTP-Response-Metadata",
                                    StructType(
                                        [
                                            StructField(
                                                "HTML-Metadata",
                                                StructType(
                                                    [
                                                        StructField(
                                                            "Head",
                                                            StructType(
                                                                [
                                                                    StructField(
                                                                        "Title",
                                                                        StringType(),
                                                                    )
                                                                ]
                                                            ),
                                                        ),
                                                        StructField(
                                                            "Links",
                                                            ArrayType(
                                                                StructType(
                                                                    [
                                                                        StructField(
                                                                            "path",
                                                                            StringType(),
                                                                        ),
                                                                        StructField(
                                                                            "url",
                                                                            StringType(),
                                                                        ),
                                                                    ]
                                                                )
                                                            ),
                                                        ),
                                                    ]
                                                ),
                                            )
                                        ]
                                    ),
                                )
                            ]
                        ),
                    ),
                ]
            ),
        )
    ]
)


def parse_wat(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """WAT ``metadata`` records → ``target_uri``/``title``/``links``
    columns (links flattened to the url strings). Pure codegen:
    binary→string cast + ``from_json`` with the partial envelope
    schema; malformed JSON rows get NULLs. Keeps every input column,
    drops the binary payload."""
    env = F.from_json(F.col(payload_col).cast("string"), WAT_SCHEMA)
    # materialize from_json ONCE as a column; every field read below is
    # a free GetStructField over it (the html_extract lesson — three
    # separate `env[...]` expressions would each re-parse the JSON
    # unless Catalyst happens to CSE them)
    tagged = df.where(F.col("warc_type") == "metadata").withColumn("__env", env)
    meta = F.col("__env")["Envelope"]["Payload-Metadata"][
        "HTTP-Response-Metadata"
    ]["HTML-Metadata"]
    out = tagged.withColumns(
        {
            "target_uri": F.coalesce(
                F.col("target_uri"),
                F.col("__env")["Envelope"]["WARC-Header-Metadata"][
                    "WARC-Target-URI"
                ],
            ),
            "title": meta["Head"]["Title"],
            "links": F.transform(meta["Links"], lambda link: link["url"]),
        }
    )
    return out.drop("__env", payload_col)


def wat_payload_expr(
    url: Column | str = "target_uri",
    title: Column | str = "title",
    links: Column | str = "links",
) -> Column:
    """The Common Crawl envelope as a JSON string column — pure
    ``to_json(struct(...))`` codegen over ``html_extract`` output.
    NULL link lists serialize as an absent field (to_json drops
    nulls), which parse_wat reads back as NULL."""
    c = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    link_structs = F.transform(
        c(links), lambda u: F.struct(F.lit("A@/href").alias("path"), u.alias("url"))
    )
    return F.to_json(
        F.struct(
            F.struct(
                F.struct(
                    c(url).alias("WARC-Target-URI"),
                ).alias("WARC-Header-Metadata"),
                F.struct(
                    F.struct(
                        F.struct(
                            F.struct(c(title).alias("Title")).alias("Head"),
                            link_structs.alias("Links"),
                        ).alias("HTML-Metadata"),
                    ).alias("HTTP-Response-Metadata"),
                ).alias("Payload-Metadata"),
            ).alias("Envelope")
        )
    )


def write_wat_shards(
    df: DataFrame,
    out_dir: str,
    url_col: str = "target_uri",
    title_col: str = "title",
    links_col: str = "links",
    date: datetime | None = None,
) -> int:
    """Distributed WAT emit: build the JSON envelope per page
    (codegen) and shard it through the WARC writer as ``metadata``
    records with ``application/json`` payloads — the mirror of
    ``write_warc_shards``' WET emit. Returns the shard count."""
    import os

    from pyspark import TaskContext

    from snapflow_spark.sources.warc import write_warc

    os.makedirs(out_dir, exist_ok=True)
    cols = df.select(
        F.col(url_col).alias("u"),
        wat_payload_expr(url_col, title_col, links_col).alias("j"),
    )

    def write_partition(rows):
        pid = TaskContext.get().partitionId()
        records = (
            (
                {
                    "WARC-Type": "metadata",
                    "WARC-Target-URI": u,
                    "Content-Type": "application/json",
                },
                j.encode("utf-8"),
            )
            for u, j in rows
            if j is not None
        )
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.gz")
        n = write_warc(path, records, date=date)
        if n == 0 and os.path.exists(path):
            os.remove(path)

    cols.foreachPartition(write_partition)
    return len([n for n in os.listdir(out_dir) if n.startswith("part-")])
