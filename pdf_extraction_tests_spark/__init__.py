"""PySpark-native main-content extraction engine.

A from-scratch re-expression of the query/data-processing capabilities of
RENAISSANCE-UIC/PDF_Extraction_Tests (an R + reticulate PDF layout/OCR
pipeline, see SURVEY.md) as a single idiomatic Spark batch job over tables of
interleaved text + media documents:

    docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>)
      -> extracted(doc_id, spans array<struct<kind,text,media_ref,order>>,
                   title, authors, abstract, main_text, boundaries, ...)

All per-document logic runs inside vectorized pandas/Arrow UDFs
(``mapInPandas`` / ``applyInPandas``); there is no per-row Python anywhere on
the hot path.  Relational / analytical operators are exposed as named queries
in :mod:`pdf_extraction_tests_spark.queries` and cross-checked against DuckDB.
"""

__version__ = "0.1.0"
