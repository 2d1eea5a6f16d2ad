"""Deterministic byte-pair-encoding (BPE) subword tokenizer.

The training-data operators (token counting q31, token-budget head q45,
sequence packing q49) planned batches with whitespace tokens — the weakest
link in the training-data story, since real pipelines budget in SUBWORD
tokens.  This module supplies a real, dependency-free BPE:

* :func:`learn_merges` — classic BPE training (Sennrich et al. 2016):
  count adjacent symbol pairs over a word-frequency table, merge the most
  frequent pair, repeat.  Deterministic tie-break (count desc, pair asc).
* :data:`DEFAULT_MERGES` — a fixed 96-merge table learned at import from
  a frozen English seed corpus: stable across runs/machines by
  construction (pure counts, no RNG), so token counts are reproducible
  cluster-wide.
* :func:`bpe_token_count` / :func:`bpe_pieces` — greedy lowest-rank merge
  application per word (the standard BPE apply loop), LRU-cached per
  distinct word.
* :func:`token_count_col` — the Spark integration point: a column
  expression (whitespace mode, codegen'd, DuckDB-oracle-able) or an
  Arrow-batched ``pandas_udf`` (bpe mode, pytest-pinned against the local
  implementation — never a row-at-a-time Python UDF).

Pre-tokenization matches q31's subword-piece regex (runs of alphanumerics,
single other non-space chars), so ``bpe`` counts are comparable to the
``subword_pieces`` column: BPE only further splits the alphanumeric runs.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, functions as F

_WORD_RE = re.compile(r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]")

# frozen seed corpus for the default merge table — ordinary English prose
# chosen for stable, unremarkable pair statistics.  Editing this string
# CHANGES TOKEN COUNTS everywhere; treat it as part of the vocabulary.
_SEED_CORPUS = """
the quick brown fox jumps over the lazy dog while the rain in spain stays
mainly in the plain and every good boy deserves fudge because all work and
no play makes jack a dull boy the question is whether this sentence with
its common words the of and to in that is was he for it with as his on be
at by had not are but from or have an they which one you were her all she
there would their we him been has when who will more if out so said what
up its about into them can only other new some could time these two may
then do first any my now such like our over man me even most made after
also did many before must through back years where much your way well
down should because each just those people too how little state good very
make world still own see men work long get here between both life being
under never day same another know while last might us great old year off
come since against go came right used take three states
"""


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict:
    counts: dict[tuple[str, str], int] = {}
    for syms, n in vocab.items():
        for i in range(len(syms) - 1):
            pair = (syms[i], syms[i + 1])
            counts[pair] = counts.get(pair, 0) + n
    return counts


def _merge_vocab(vocab: dict, pair: tuple[str, str]) -> dict:
    a, b = pair
    ab = a + b
    out: dict[tuple[str, ...], int] = {}
    for syms, n in vocab.items():
        merged = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(ab)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        out[tuple(merged)] = out.get(tuple(merged), 0) + n
    return out


def learn_merges(corpus: str, n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE training over a corpus string.  Fully deterministic:
    ties broken by (count desc, pair lexicographic asc)."""
    freqs: dict[str, int] = {}
    for w in _WORD_RE.findall(corpus.lower()):
        freqs[w] = freqs.get(w, 0) + 1
    return _learn_from_freqs(freqs, n_merges)


def _learn_from_freqs(freqs: dict[str, int],
                      n_merges: int) -> list[tuple[str, str]]:
    """The merge loop proper, over an aggregated word-frequency table —
    shared by the local and the Spark trainer (training cost depends on
    DISTINCT words, never corpus size)."""
    vocab = {tuple(w): n for w, n in freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def learn_merges_spark(docs, n_merges: int, text_col: str = "text",
                       sample: int = 4096) -> list[tuple[str, str]]:
    """Learn a BPE merge table FROM THE CORPUS with Spark doing the heavy
    lifting: one distributed word-frequency aggregation, then the classic
    merge loop over the (tiny, bounded) frequency table on the driver —
    the shape production tokenizer training uses (word counts are
    aggregated first precisely because the merge loop's cost depends on
    distinct words, not corpus size).

    ``sample`` keeps the most frequent distinct words (deterministic
    tie-break on the word), bounding driver memory at any corpus scale;
    rare-word tails cannot move the early merges.

    Pinned in tests: equals :func:`_learn_from_freqs` over the same
    frequency table, and on a small corpus equals plain
    :func:`learn_merges` over the concatenated text.
    """
    from pyspark.sql import functions as F

    rows = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(
            F.expr(rf"regexp_extract_all(lower({text_col}), "
                   rf"'[a-z0-9]+|[^a-z0-9\\s]', 0)")).alias("w"))
        .groupBy("w").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(sample)
        .collect()  # bounded-sample ok: <= `sample` rows by limit()
    )
    return _learn_from_freqs({r.w: int(r.n) for r in rows}, n_merges)


DEFAULT_MERGES: list[tuple[str, str]] = learn_merges(_SEED_CORPUS, 96)
_RANK: dict[tuple[str, str], int] = {
    p: i for i, p in enumerate(DEFAULT_MERGES)}


@lru_cache(maxsize=65536)
def bpe_pieces(word: str) -> tuple[str, ...]:
    """Greedy BPE apply: repeatedly merge the LOWEST-RANK adjacent pair
    (the standard apply loop — rank order, not left-to-right order)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = _RANK.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return tuple(syms)


def bpe_token_count(text: str | None) -> int:
    """Subword token count of ``text`` under DEFAULT_MERGES (lowercased
    for merge lookup; counts are case-insensitive by construction)."""
    if text is None:
        return 0
    return sum(len(bpe_pieces(w)) for w in _WORD_RE.findall(text.lower()))


def bpe_tokenize(text: str) -> list[str]:
    """The pieces themselves (debugging / vocabulary inspection)."""
    out: list[str] = []
    for w in _WORD_RE.findall(text.lower()):
        out.extend(bpe_pieces(w))
    return out


def token_count_col(text_col: str, tokenizer: str = "whitespace") -> Column:
    """Token-count column under the chosen tokenizer.

    ``whitespace``: codegen'd split/size — exactly the q45/q49 legacy
    semantics and DuckDB-oracle-able.  ``bpe``: Arrow-batched pandas_udf
    over :func:`bpe_token_count` (per-word LRU cache amortizes repeated
    vocabulary across a batch; pytest pins Spark == local).  At 100 TB the
    bpe path stays scan-side (no shuffle; one Python worker per core) —
    the downstream prefix-sum machinery is tokenizer-agnostic.
    """
    if tokenizer == "whitespace":
        return F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    if tokenizer != "bpe":
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _count(texts: pd.Series) -> pd.Series:
        return texts.map(bpe_token_count).astype("int64")

    return _count(F.col(text_col))
