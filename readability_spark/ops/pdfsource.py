"""PDF source path: binary PDF payloads → extracted text, Arrow-batched.

The north rule's extraction tier spans "HTML boilerplate strip, PDF/layout
parse"; this operator is the PDF leg.  PDFs travel as an opaque ``binary``
column, and both directions run as ``mapInPandas`` (one Arrow batch in/out,
no per-row Python at the Spark level):

- ``synth_pdfs``: documents.text → valid single-page PDFs
  (readability_core.pdftext.make_simple_pdf — Flate streams, hex Tj);
- ``extract_pdf_text_df``: binary PDFs → text
  (readability_core.pdftext.extract_pdf_text — the honest pure-Python
  Tj/TJ/FlateDecode parser, CMap-less fonts degrade to silence).

The gate query ``pdf_extract`` chains the two: because the generator/
extractor pair round-trips exactly, the DuckDB oracle is simply the source
table — an end-to-end exactness proof of the whole PDF parse path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from readability_core.pdftext import extract_pdf_text, make_simple_pdf

from .common import table

PDF_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("pdf", T.BinaryType()),
])

PDF_TEXT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def synth_pdfs(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, pdf binary), one single-page PDF per doc."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            yield pd.DataFrame({
                "doc_id": pdf_batch["doc_id"],
                "pdf": [make_simple_pdf([t if t is not None else ""])
                        for t in pdf_batch["text"]],
            })

    return docs.select("doc_id", "text").mapInPandas(gen, schema=PDF_SCHEMA)


def extract_pdf_text_df(pdfs: DataFrame) -> DataFrame:
    """(doc_id, pdf binary) → (doc_id, text)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in batches:
            yield pd.DataFrame({
                "doc_id": pdf_batch["doc_id"],
                "text": [extract_pdf_text(bytes(b)) if b is not None else ""
                         for b in pdf_batch["pdf"]],
            })

    return pdfs.mapInPandas(gen, schema=PDF_TEXT_SCHEMA)


def pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: text → PDF → text over the documents table.  Exact
    oracle = the source table itself (the round trip is byte-exact)."""
    docs = table(spark, sf_dir, "documents")
    return (extract_pdf_text_df(synth_pdfs(docs))
            .orderBy("doc_id"))


PDF_EXTRACT_SQL = """
SELECT doc_id, text FROM documents ORDER BY doc_id
"""
