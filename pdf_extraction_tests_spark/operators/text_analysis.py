"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

All pure column expressions (whole-stage codegen; zero UDFs, zero shuffles
beyond any final aggregation the caller adds) with exact DuckDB oracles.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# Language ID: char-trigram frequency profiles (the standard n-gram LID
# design, Cavnar & Trenkle 1994 shape) — DISCRIMINATIVE trigrams learned at
# import from frozen per-language seed paragraphs, so the profiles are
# reproducible literals and the classifier stays expressible as pure column
# arithmetic on BOTH engines (occurrence counts via length-replace).  The
# round-4 marker-word toy is gone; the classifier shape (profile hits ->
# argmax with threshold, deterministic tie priority) is unchanged and still
# mirrors the reference's format detector (v10.R:603-675).
# ---------------------------------------------------------------------------

# frozen seed prose — editing any paragraph CHANGES THE CLASSIFIER.
_LANG_SEEDS: dict[str, str] = {
    "en": ("the quick brown fox jumps over the lazy dog and every morning "
           "the people of the town would gather in the market to talk about "
           "the weather the news and the price of bread which had been "
           "rising for many years while the children played in the street "
           "and the old men watched them with quiet smiles remembering the "
           "days of their own youth and the things that they had seen"),
    "de": ("der schnelle braune fuchs springt über den faulen hund und "
           "jeden morgen versammelten sich die menschen der stadt auf dem "
           "markt um über das wetter die nachrichten und den preis des "
           "brotes zu sprechen der seit vielen jahren stieg während die "
           "kinder auf der straße spielten und die alten männer ihnen mit "
           "einem stillen lächeln zusahen und sich an die tage ihrer "
           "eigenen jugend erinnerten"),
    "fr": ("le rapide renard brun saute par dessus le chien paresseux et "
           "chaque matin les gens de la ville se réunissaient au marché "
           "pour parler du temps des nouvelles et du prix du pain qui "
           "augmentait depuis de nombreuses années pendant que les enfants "
           "jouaient dans la rue et que les vieux hommes les regardaient "
           "avec un sourire tranquille en se souvenant des jours de leur "
           "propre jeunesse"),
    "es": ("el rápido zorro marrón salta sobre el perro perezoso y cada "
           "mañana la gente del pueblo se reunía en el mercado para hablar "
           "del tiempo de las noticias y del precio del pan que había "
           "subido durante muchos años mientras los niños jugaban en la "
           "calle y los viejos hombres los miraban con una sonrisa "
           "tranquila recordando los días de su propia juventud"),
}

_TRI_OK_RE = re.compile(r"^[a-zà-ÿ ]{3}$")
N_TRIGRAMS = 24  # per language; equal sizes keep raw counts comparable


def _trigram_freqs(text: str) -> dict[str, float]:
    padded = f" {text} "
    counts: dict[str, int] = {}
    for i in range(len(padded) - 2):
        t = padded[i:i + 3]
        if _TRI_OK_RE.match(t) and t != "   ":
            counts[t] = counts.get(t, 0) + 1
    total = max(sum(counts.values()), 1)
    return {t: n / total for t, n in counts.items()}


def _learn_trigrams(seeds: dict[str, str], k: int) -> dict[str, list[str]]:
    """Top-k trigrams per language by DISCRIMINATIVE score: own relative
    frequency minus the max across the other languages (a trigram common
    everywhere scores ~0 and is dropped).  Deterministic: ties break on
    the trigram itself."""
    freqs = {lang: _trigram_freqs(s) for lang, s in seeds.items()}
    out: dict[str, list[str]] = {}
    for lang, f in freqs.items():
        others = [freqs[o] for o in freqs if o != lang]
        scored = sorted(
            ((fv - max(o.get(t, 0.0) for o in others), t)
             for t, fv in f.items()),
            key=lambda st: (-st[0], st[1]))
        out[lang] = [t for _, t in scored[:k]]
    return out


LANG_TRIGRAMS: dict[str, list[str]] = _learn_trigrams(_LANG_SEEDS,
                                                      N_TRIGRAMS)
_LID_THRESHOLD = 2  # < 2 profile hits -> 'und'


def with_language_guess(docs: DataFrame, text_col: str = "text") -> DataFrame:
    padded = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {
        lang: sum(
            (F.length(padded) - F.length(F.replace(padded, F.lit(t), F.lit(""))))
            / F.lit(3)
            for t in tris
        )
        for lang, tris in LANG_TRIGRAMS.items()
    }
    best_score = F.greatest(*scores.values())
    guess = F.lit("und")
    # deterministic priority order on ties: en > de > fr > es
    for lang in reversed(list(LANG_TRIGRAMS)):
        guess = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(guess)
    return docs.withColumn(
        "lang_guess",
        F.when(best_score >= _LID_THRESHOLD, guess).otherwise(F.lit("und"))
    )


def language_guess_sql(table: str = "documents") -> str:
    def score(tris):
        return " + ".join(
            f"(length(p) - length(replace(p, '{t}', ''))) / 3" for t in tris
        )

    cases = []
    for lang in LANG_TRIGRAMS:  # first match wins => priority en,de,fr,es
        cases.append(
            f"WHEN s_{lang} = best AND best >= {_LID_THRESHOLD} "
            f"THEN '{lang}'")
    score_cols = ",\n             ".join(
        f"({score(t)}) AS s_{lang}" for lang, t in LANG_TRIGRAMS.items()
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


def with_token_counts(docs: DataFrame, text_col: str = "text",
                      tokenizer: str = "whitespace") -> DataFrame:
    """Whitespace tokens + subword-piece count (word-boundary pieces:
    runs of letters, digits, or single punctuation — the deterministic
    proxy for tokenizer load planning).  ``tokenizer='bpe'`` ADDS a
    ``bpe_tokens`` column: real greedy-merge subword counts from
    :mod:`..functions.bpe` (Arrow-batched kernel, pytest-pinned ==
    the local implementation; not DuckDB-expressible, so q31 registers
    the whitespace mode)."""
    t = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(t), r"\s+"))
    # RE2-compatible (no lookarounds) so the DuckDB oracle is exact
    pieces = F.size(F.expr(rf"regexp_extract_all({text_col}, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]', 0)"))
    out = docs.withColumn("ws_tokens", ws_tokens).withColumn(
        "subword_pieces", pieces)
    if tokenizer == "bpe":
        from ..functions.bpe import token_count_col

        out = out.withColumn(
            "bpe_tokens", token_count_col(text_col, "bpe"))
    elif tokenizer != "whitespace":
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    return out


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
