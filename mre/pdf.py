"""PDF extraction pipeline (north_rule: "PDF/layout parse").

Same shape as the HTML pipeline: binary payload column → size-capped
mapInPandas → typed text output. The extractor (mre.core.pdftext) is pure
stdlib; ``pdfs_from_documents`` deterministically renders each documents
row into a real (Flate-compressed) PDF whose text is the row's text wrapped
at WRAP_TOKENS tokens per line — so the end-to-end result has an exact SQL
oracle (re-create the wrapping in SQL and compare).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .core.pdftext import extract_pdf_text, make_pdf

WRAP_TOKENS = 8

PDF_DOCS_SCHEMA = "doc_id bigint, pdf binary"
PDF_TEXT_SCHEMA = "doc_id bigint, pdf_text string, ok int"


def wrap_lines(text: str, width: int = WRAP_TOKENS) -> list[str]:
    toks = text.split(" ")
    return [" ".join(toks[i:i + width]) for i in range(0, len(toks), width)]


def pdfs_from_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, pdf bytes); rendering is distributed."""
    def render(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "pdf": [make_pdf(wrap_lines(t)) if t else None
                        for t in pdf["text"]],
            })

    return docs.select("doc_id", "text").mapInPandas(
        render, PDF_DOCS_SCHEMA)


def extract_pdf_batch(batches: Iterable[pd.DataFrame]
                      ) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts = [extract_pdf_text(bytes(b) if b is not None else None)
                 for b in pdf["pdf"]]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "pdf_text": texts,
            "ok": [1 if t is not None else 0 for t in texts],
        })


def run_pdf_extract(docs: DataFrame) -> DataFrame:
    """documents → PDFs → extracted text (the full PDF path)."""
    return pdfs_from_documents(docs).mapInPandas(
        extract_pdf_batch, PDF_TEXT_SCHEMA)


__all__ = ["pdfs_from_documents", "extract_pdf_batch", "run_pdf_extract",
           "wrap_lines", "WRAP_TOKENS"]
