"""Payload format sniffing (functions/sniff.py): every label the
engine decodes detects from REAL bytes produced by the repo's own
encoder twins (not hand-typed magics where an encoder exists), header
lies are overruled, the plan is pure codegen, and the YAML router
attaches the label column.
"""

import gzip
import io
import json
import zipfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from snapflow_spark.functions.sniff import sniff_format_expr


def _real_payloads():
    """(label, bytes) — encoder-twin output wherever the repo has an
    encoder, minimal valid headers elsewhere."""
    from snapflow_spark.multimodal.codec import encode_bmp, encode_png
    from snapflow_spark.multimodal.gif import encode_gif
    from snapflow_spark.multimodal.jpeg import encode_jpeg
    from snapflow_spark.multimodal.pdf import make_pdf_bytes
    from snapflow_spark.multimodal.tiff import encode_tiff

    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    frames = img[None, ...]  # (t, h, w, 3) RGB animation, 1 frame
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", "hi")
    cases = [
        ("pdf", make_pdf_bytes(["Hello"])),
        ("png", encode_png(img)),
        ("jpeg", encode_jpeg(img)),
        ("gif", encode_gif(frames)),
        ("tiff", encode_tiff(img)),
        ("bmp", encode_bmp(img)),
        ("gzip", gzip.compress(b"payload")),
        ("zip", buf.getvalue()),
        ("warc", b"WARC/1.0\r\nWARC-Type: response\r\n"),
        ("xml", b'  <?xml version="1.0"?><urlset/>'),
        ("html", b"<!DOCTYPE HTML><html><body>x</body></html>"),
        ("html", b"<HtMl lang='en'><p>y</p>"),
        ("html", b"  <div class='frag'>no doctype</div>"),
        ("json", json.dumps({"a": [1, 2]}).encode()),
        # whitespace-prefixed textual payloads: real crawls routinely
        # lead with \n or \t, which space-only ltrim would misroute
        ("html", b"\n<!doctype html>\n<html><body>x</body></html>"),
        ("html", b"\r\n\t<html lang='en'><p>y</p>"),
        ("json", b'\t{"a": 1}'),
        ("xml", b'\n\n<?xml version="1.0"?><urlset/>'),
        ("plain", "ordinary prose, no magic at all — even unicode ü".encode()),
        ("unknown", b"\x00\x01\x02\x03 binary gibberish"),
        ("plain", b"BMW review: not a bitmap"),
    ]
    # audio/video twins
    from snapflow_spark.multimodal.audio import encode_wav
    from snapflow_spark.multimodal.flac import encode_flac

    samples = (np.sin(np.linspace(0, 20, 400)) * 20000).astype(np.int16)
    cases.append(("wav", encode_wav(samples[:, None], 16000)))
    cases.append(("flac", encode_flac(samples[:, None], 16000)))
    from snapflow_spark.multimodal.video import encode_avi_mjpeg

    vid = np.zeros((2, 16, 16, 3), dtype=np.uint8)
    cases.append(("avi", encode_avi_mjpeg(vid, fps=5)))
    return cases


def test_sniffs_real_encoder_output(spark):
    cases = _real_payloads()
    df = spark.createDataFrame(
        [(i, lab, bytearray(b)) for i, (lab, b) in enumerate(cases)],
        "i int, want string, payload binary",
    )
    got = df.select(
        "i", "want", sniff_format_expr("payload").alias("fmt")
    ).collect()
    for r in got:
        assert r.fmt == r.want, (r.i, r.want, r.fmt)


def test_null_payload_labels_null_and_header_lies_lose(spark):
    from snapflow_spark.multimodal.pdf import make_pdf_bytes

    df = spark.createDataFrame(
        [
            (0, bytearray(make_pdf_bytes(["x"])), "text/plain"),
            (1, None, "text/html"),
        ],
        "i int, payload binary, content_type string",
    )
    rows = {r.i: r.fmt for r in df.select(
        "i", sniff_format_expr("payload").alias("fmt")
    ).collect()}
    assert rows[0] == "pdf"  # the lying header never enters the sniff
    assert rows[1] is None


def test_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([(bytearray(b"x"),)], "payload binary")
    plan = (
        df.select(sniff_format_expr("payload").alias("f"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan


def test_yaml_router_builtin(spark):
    from snapflow_spark.plans.yaml_config import BUILTINS

    df = spark.createDataFrame(
        [(bytearray(b"%PDF-1.7 x"),), (bytearray(b"<html><p>t</p>"),)],
        "payload binary",
    )
    out = BUILTINS["core.sniff_format"](spark, df)
    assert [r.format for r in out.collect()] == ["pdf", "html"]
