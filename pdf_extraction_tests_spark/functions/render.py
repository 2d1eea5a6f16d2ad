"""Prompt-document rendering sink (SURVEY §2.1 S7).

The reference's ``prepare_for_claude`` (Document_Processor_DocLayout_YOLO_
Code_v10.R:3591-3667) renders a processed document summary into one text
blob for LLM consumption.  Here: a pure ``format_string``/``concat_ws``
projection over the extracted table — a column expression, not a UDF, so
it runs inside whole-stage codegen and can feed any sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TEMPLATE = (
    "DOCUMENT: %s\nFORMAT: %s (%d pages, %d text regions)\n"
    "TITLE: %s\nAUTHORS: %s\n\nABSTRACT:\n%s\n\nMAIN TEXT:\n%s\n"
)


def render_prompt_documents(extracted: DataFrame,
                            max_main_chars: int = 8000) -> DataFrame:
    """extracted table -> (doc_id, prompt_text).

    ``main_text`` is truncated to ``max_main_chars`` (the reference's
    str_trunc on render, v10.R:3652-3659).
    """
    return extracted.select(
        "doc_id",
        F.format_string(
            _TEMPLATE,
            F.col("doc_id"),
            F.coalesce("document_format", F.lit("unknown")),
            F.coalesce("total_pages", F.lit(0)),
            F.coalesce("total_text_regions", F.lit(0)),
            F.coalesce("title", F.lit("")),
            F.coalesce("authors", F.lit("")),
            F.coalesce("abstract", F.lit("")),
            F.substring(F.coalesce("main_text", F.lit("")), 1, max_main_chars),
        ).alias("prompt_text"),
    )
