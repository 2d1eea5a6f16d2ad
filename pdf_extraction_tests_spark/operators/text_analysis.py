"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All pure column expressions (whole-stage codegen; zero UDFs, zero shuffles
beyond any final aggregation the caller adds) with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# deterministic marker-word language heuristic (n-gram/stopword style).
# On real corpora this would be char-trigram frequency profiles; the
# classifier *shape* (weighted marker hits -> argmax with threshold) is what
# matters and mirrors the reference's format detector (v10.R:603-675).
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
}


def with_language_guess(docs: DataFrame, text_col: str = "text") -> DataFrame:
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {
        lang: sum(
            (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit(""))))
            / F.lit(len(m))
            for m in markers
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best_score = F.greatest(*scores.values())
    guess = F.lit("und")
    # deterministic priority order on ties: en > de > fr > es
    for lang in reversed(list(LANG_MARKERS)):
        guess = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(guess)
    return docs.withColumn(
        "lang_guess", F.when(best_score >= 1, guess).otherwise(F.lit("und"))
    )


def language_guess_sql(table: str = "documents") -> str:
    def score(markers):
        return " + ".join(
            f"(length(p) - length(replace(p, '{m}', ''))) / {len(m)}" for m in markers
        )

    cases = []
    for lang in LANG_MARKERS:  # first match wins => priority order en,de,fr,es
        cases.append(f"WHEN s_{lang} = best AND best >= 1 THEN '{lang}'")
    score_cols = ",\n             ".join(
        f"({score(m)}) AS s_{lang}" for lang, m in LANG_MARKERS.items()
    )
    return f"""
    SELECT doc_id, CASE {' '.join(cases)} ELSE 'und' END AS lang_guess
    FROM (
      SELECT doc_id, greatest(s_en, s_de, s_fr, s_es) AS best, s_en, s_de, s_fr, s_es
      FROM (
        SELECT doc_id,
             {score_cols}
        FROM (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM {table}) t0
      ) t1
    ) t2
    """


def with_quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0, 1]: length band, stopword ratio,
    alpha ratio, mean word length band — the standard pre-training filters
    (C4/Gopher-style rules) as one codegen'd expression."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = F.split(t, " ")
    n_words = F.size(words)
    stop = F.size(
        F.filter(words, lambda w: F.lower(w).isin("the", "a", "of", "and", "to"))
    )
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z ]", ""))
    mean_wlen = (n_chars - n_words + 1) / F.greatest(n_words, F.lit(1))
    score = (
        F.when((n_chars >= 50) & (n_chars <= 10000), 0.25).otherwise(0.0)
        + F.when((stop / F.greatest(n_words, F.lit(1))) >= 0.01, 0.25).otherwise(0.0)
        + F.when((alpha / F.greatest(n_chars, F.lit(1))) >= 0.8, 0.25).otherwise(0.0)
        + F.when((mean_wlen >= 3) & (mean_wlen <= 12), 0.25).otherwise(0.0)
    )
    return docs.withColumn("quality", score)


def quality_score_sql(table: str = "documents") -> str:
    return f"""
    SELECT doc_id,
      (CASE WHEN length(text) BETWEEN 50 AND 10000 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN CAST(len(list_filter(string_split(text,' '),
              w -> lower(w) IN ('the','a','of','and','to'))) AS DOUBLE)
            / greatest(len(string_split(text,' ')), 1) >= 0.01 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
            / greatest(length(text), 1) >= 0.8 THEN 0.25 ELSE 0.0 END)
    + (CASE WHEN CAST(length(text) - len(string_split(text,' ')) + 1 AS DOUBLE)
            / greatest(len(string_split(text,' ')), 1) BETWEEN 3 AND 12
       THEN 0.25 ELSE 0.0 END) AS quality
    FROM {table}
    """


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (word-boundary pieces:
    runs of letters, digits, or single punctuation — a cheap deterministic
    proxy for tokenizer load planning)."""
    t = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(t), r"\s+"))
    # RE2-compatible (no lookarounds) so the DuckDB oracle is exact
    pieces = F.size(F.expr(rf"regexp_extract_all({text_col}, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]', 0)"))
    return docs.withColumn("ws_tokens", ws_tokens).withColumn("subword_pieces", pieces)


def token_counts_sql(table: str = "documents") -> str:
    return f"""
    SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) AS subword_pieces
    FROM {table}
    """


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """48-bit content fingerprint of the whitespace-normalized lowercase
    text (rolling-hash stand-in; md5-derived for the cross-engine oracle)."""
    fp = F.expr(
        f"cast(conv(substr(md5(lower(regexp_replace({text_col}, '\\\\s+', ' '))), 1, 12), 16, 10) as bigint)"
    )
    return docs.withColumn("fingerprint", fp)
