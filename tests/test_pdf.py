"""PDF text/layout extraction tests (mre.core.pdftext + mre.pdf)."""

import zlib

import pytest

from mre.core.pdftext import extract_pdf_text, make_pdf


LINES = ["First line of the document, with (parens) and \\ slash.",
         "Second line follows here.",
         "Third and final line."]


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip(compress):
    assert extract_pdf_text(make_pdf(LINES, compress=compress)) == \
        "\n".join(LINES)


def test_layout_reading_order():
    # text drawn out of stream order must come back in reading order
    content = (b"BT /F1 12 Tf 72 600 Td (bottom line) Tj "
               b"1 0 0 1 72 700 Tm (top line) Tj ET")
    body = zlib.compress(content)
    pdf = (b"%PDF-1.4\n1 0 obj << /Length " + str(len(body)).encode()
           + b" /Filter /FlateDecode >>\nstream\n" + body
           + b"\nendstream\nendobj\n%%EOF")
    assert extract_pdf_text(pdf) == "top line\nbottom line"


def test_tj_array_and_quote_ops():
    content = (b"BT /F1 10 Tf 14 TL 72 720 Td [(Hel) (lo)] TJ "
               b"(world) ' ET")
    pdf = (b"%PDF-1.4\n1 0 obj << /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF")
    assert extract_pdf_text(pdf) == "Hello\nworld"


def test_octal_and_hex_strings():
    content = b"BT 72 720 Td (A\\101) Tj <4243> Tj ET"
    pdf = (b"%PDF-1.4\n1 0 obj << /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF")
    assert extract_pdf_text(pdf) == "AABC"


def test_never_raises():
    assert extract_pdf_text(None) is None
    assert extract_pdf_text(b"") is None
    assert extract_pdf_text(b"not a pdf") is None
    assert extract_pdf_text(b"%PDF-1.4 garbage without streams") is None
    # corrupted flate body
    pdf = (b"%PDF-1.4\n1 0 obj << /Length 5 /Filter /FlateDecode >>\n"
           b"stream\nXXXXX\nendstream\nendobj")
    assert extract_pdf_text(pdf) is None
    # truncations of a valid pdf
    full = make_pdf(LINES)
    for cut in range(0, len(full), 97):
        extract_pdf_text(full[:cut])  # must not raise


def test_spark_pdf_pipeline(spark):
    from mre.pdf import run_pdf_extract, wrap_lines
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(40)
    out = {r["doc_id"]: r for r in run_pdf_extract(docs).collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(out) == 40
    for doc_id, text in src.items():
        assert out[doc_id]["ok"] == 1
        assert out[doc_id]["pdf_text"] == "\n".join(wrap_lines(text))
