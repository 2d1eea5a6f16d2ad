"""BPE tokenizer tests (functions/bpe.py) and the tokenizer= switch
through q31/q45/q49's operators.

Oracle strategy: greedy lowest-rank apply is pinned against the OTHER
classic formulation (apply merges sequentially in rank order — the
subword-nmt reference shape), plus hand cases; the Spark kernels are
pinned against the local pure-Python implementation (the driver can't
DuckDB-oracle BPE, so whitespace mode stays the registered path).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_extraction_tests_spark.functions import bpe as B

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _ref_apply(word: str, merges) -> list[str]:
    """Reference BPE apply: each merge in rank order, one left-to-right
    pass — structurally different from the greedy lowest-rank loop."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


class TestLearnMerges:
    def test_deterministic(self):
        m1 = B.learn_merges(B._SEED_CORPUS, 96)
        m2 = B.learn_merges(B._SEED_CORPUS, 96)
        assert m1 == m2 == B.DEFAULT_MERGES
        assert len(B.DEFAULT_MERGES) == 96

    def test_learns_english_pairs(self):
        # 'th'/'he' are the highest-frequency English bigrams; both must
        # appear very early in any merge table learned from English prose
        early = B.DEFAULT_MERGES[:10]
        assert ("t", "h") in early
        assert ("th", "e") in early or ("h", "e") in early

    def test_tiny_corpus(self):
        merges = B.learn_merges("ab ab ab ac", 10)
        assert merges[0] == ("a", "b")  # most frequent pair first
        assert len(merges) <= 10        # stops when no pairs remain

    def test_tie_break_lexicographic(self):
        # 'xy' and 'pq' both appear exactly twice: lexicographic wins
        merges = B.learn_merges("xy xy pq pq", 1)
        assert merges[0] == ("p", "q")


class TestApply:
    def test_matches_sequential_reference(self):
        words = ("the quick brown extraordinarily overengineered "
                 "internationalization straightforwardness 12345 "
                 "antidisestablishmentarianism xylophone zzz").split()
        for w in words:
            assert list(B.bpe_pieces(w)) == _ref_apply(w, B.DEFAULT_MERGES)

    def test_hand_cases(self):
        assert B.bpe_token_count(None) == 0
        assert B.bpe_token_count("") == 0
        assert B.bpe_token_count("   ") == 0
        # 'the' is a single token under any English merge table
        assert B.bpe_pieces("the") == ("the",)
        # unknown script stays character-split
        assert len(B.bpe_pieces("qqqq")) == 4

    def test_punctuation_and_digits_are_pieces(self):
        # pre-tokenization: alnum runs + single other chars
        n = B.bpe_token_count("the, the.")
        assert n == len(B.bpe_tokenize("the, the.")) == 4  # the , the .

    def test_case_insensitive_counts(self):
        assert B.bpe_token_count("The THE the") == B.bpe_token_count(
            "the the the")

    def test_count_never_exceeds_char_count(self):
        for t in ("hello world", "a b c", "Straße—naïve", "x" * 100):
            assert 0 < B.bpe_token_count(t) <= len(t)

    def test_unknown_tokenizer_rejected(self):
        with pytest.raises(ValueError):
            B.token_count_col("text", "wordpiece")


class TestSparkParity:
    def test_with_token_counts_bpe_matches_local(self, spark, docs):
        from pdf_extraction_tests_spark.operators.text_analysis import (
            with_token_counts)

        d = docs.filter(F.col("doc_id") < 80)
        got = (with_token_counts(d, tokenizer="bpe")
               .select("doc_id", "text", "bpe_tokens").toPandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = got["text"].map(B.bpe_token_count)
        assert (got["bpe_tokens"] == want).all()
        # and the whitespace columns are still present and unchanged
        base = (with_token_counts(d).select("doc_id", "ws_tokens",
                                            "subword_pieces").toPandas()
                .sort_values("doc_id").reset_index(drop=True))
        both = (with_token_counts(d, tokenizer="bpe")
                .select("doc_id", "ws_tokens", "subword_pieces").toPandas()
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(base, both)

    def test_sequence_pack_bpe_matches_local_prefix_sum(self, spark, docs):
        from pdf_extraction_tests_spark.operators.packing import (
            sequence_pack)

        d = docs.filter(F.col("doc_id") < 150)
        got = (sequence_pack(d, seq_len=64, tokenizer="bpe").toPandas()
               .sort_values("doc_id").reset_index(drop=True))
        local = (d.filter(F.col("text").isNotNull())
                 .select("doc_id", "text").toPandas()
                 .sort_values("doc_id").reset_index(drop=True))
        local["n_tokens"] = local["text"].map(B.bpe_token_count)
        prior = local["n_tokens"].cumsum().shift(fill_value=0)
        assert (got["n_tokens"] == local["n_tokens"]).all()
        assert (got["seq_id"] == prior // 64).all()
        assert (got["seq_offset"] == prior % 64).all()

    def test_q45_bpe_mode_budget_respected(self, spark):
        from pdf_extraction_tests_spark.queries import q45

        got = (q45(spark, SF, tokenizer="bpe").toPandas()
               .sort_values("cum_tokens").reset_index(drop=True))
        assert len(got) > 0
        assert int(got["cum_tokens"].max()) <= 20000
        # strictly increasing cumulative counts, no duplicate docs
        assert got["cum_tokens"].is_monotonic_increasing
        assert got["doc_id"].is_unique

class TestSparkTraining:
    def test_spark_trainer_matches_local(self, spark, docs):
        """learn_merges_spark == learn_merges over the same text when the
        sample covers every distinct word (small corpus)."""
        d = docs.filter(F.col("doc_id") < 60)
        local_corpus = " ".join(
            r.text for r in d.filter(F.col("text").isNotNull())
            .select("text").collect())
        want = B.learn_merges(local_corpus, 32)
        got = B.learn_merges_spark(d, 32, sample=100000)
        assert got == want
        assert len(got) == 32

    def test_spark_trainer_deterministic(self, spark, docs):
        d = docs.filter(F.col("doc_id") < 40)
        assert (B.learn_merges_spark(d, 16)
                == B.learn_merges_spark(d, 16))

    def test_sample_bounds_vocabulary(self, spark, docs):
        # tiny sample: still trains, still deterministic, never collects
        # more than `sample` rows
        got = B.learn_merges_spark(docs, 8, sample=50)
        assert len(got) == 8


class TestIndexedTrainer:
    """The incremental indexed merge loop must equal the naive
    recount-everything loop merge for merge (selection AND tie-breaks)."""

    @pytest.mark.parametrize("seed,n_merges", [(0, 64), (1, 200), (2, 96)])
    def test_matches_naive(self, seed, n_merges):
        import numpy as np

        rng = np.random.RandomState(seed)
        alphabet = list("abcdefgh")
        words = ["".join(rng.choice(alphabet, size=rng.randint(1, 12)))
                 for _ in range(300)]
        freqs: dict[str, int] = {}
        for w in words:
            freqs[w] = freqs.get(w, 0) + int(rng.randint(1, 9))
        fast = B._learn_from_freqs(dict(freqs), n_merges)
        naive = B._learn_from_freqs_naive(dict(freqs), n_merges)
        assert fast == naive

    def test_matches_naive_on_seed_corpus(self):
        freqs: dict[str, int] = {}
        for w in B._WORD_RE.findall(B._SEED_CORPUS.lower()):
            freqs[w] = freqs.get(w, 0) + 1
        assert (B._learn_from_freqs(dict(freqs), 96)
                == B._learn_from_freqs_naive(dict(freqs), 96))

    def test_exhausts_and_stops(self):
        # more merges requested than pairs exist: stops cleanly
        got = B._learn_from_freqs({"ab": 3, "cd": 2}, 50)
        assert got == [("a", "b"), ("c", "d")]

    def test_large_table_is_practical(self):
        # 2k merges over a 4k-word vocabulary completes quickly — the
        # whole point of the indexed loop (naive would take minutes)
        import time

        import numpy as np

        rng = np.random.RandomState(9)
        alphabet = list("abcdefghijklmnop")
        freqs = {}
        while len(freqs) < 4096:
            w = "".join(rng.choice(alphabet, size=rng.randint(2, 14)))
            freqs[w] = freqs.get(w, 0) + 1
        t0 = time.time()
        got = B._learn_from_freqs(freqs, 2048)
        assert len(got) == 2048
        assert time.time() - t0 < 60


class TestCorpusLearnedTable:
    def test_snapshot_round_trip_equals_retrained(self, spark, docs,
                                                  tmp_path):
        """train-once/load-everywhere: the snapshot artifact reloads to
        exactly the table a retrain produces (advice item: corpus-learned
        BPE as the default bpe mode)."""
        d = docs.filter(F.col("doc_id") < 100)
        table_dir = str(tmp_path / "bpe_merges")
        trained = B.train_merge_table(spark, d, table_dir, n_merges=128)
        loaded = B.load_merge_table(spark, table_dir)
        assert loaded == trained
        retrained = B.learn_merges_spark(d, 128)
        assert loaded == retrained

    def test_token_count_col_custom_merges_matches_local(self, spark,
                                                         docs):
        d = docs.filter(F.col("doc_id") < 60)
        merges = B.learn_merges_spark(d, 64)
        tok = B.BpeTokenizer(merges)
        got = (d.filter(F.col("text").isNotNull())
               .select("doc_id", "text",
                       B.token_count_col("text", "bpe", merges)
                       .alias("n"))
               .toPandas().sort_values("doc_id").reset_index(drop=True))
        assert (got["n"] == got["text"].map(tok.token_count)).all()

    def test_corpus_table_compresses_better_than_seed(self, spark, docs):
        """A table learned FROM the corpus yields no more tokens on that
        corpus than the generic 96-merge seed table (it subsumes the
        frequent corpus vocabulary)."""
        d = docs.filter(F.col("doc_id") < 150)
        merges = B.learn_merges_spark(d, 1024)
        tok = B.BpeTokenizer(merges)
        texts = [r.text for r in d.filter(F.col("text").isNotNull())
                 .select("text").collect()]
        corpus_total = sum(tok.token_count(t) for t in texts)
        seed_total = sum(B.bpe_token_count(t) for t in texts)
        assert corpus_total < seed_total

    def test_default_tokenizer_is_seed_table(self):
        assert B.BpeTokenizer(B.DEFAULT_MERGES).token_count(
            "the quick brown fox") == B.bpe_token_count(
            "the quick brown fox")

    def test_load_missing_table_raises(self, spark, tmp_path):
        with pytest.raises(ValueError):
            B.load_merge_table(spark, str(tmp_path / "nope"))

    def test_sequence_pack_with_corpus_merges(self, spark, docs):
        from pdf_extraction_tests_spark.operators.packing import (
            sequence_pack)

        d = docs.filter(F.col("doc_id") < 80)
        merges = B.learn_merges_spark(d, 64)
        tok = B.BpeTokenizer(merges)
        got = (sequence_pack(d, seq_len=64, tokenizer="bpe",
                             merges=merges).toPandas()
               .sort_values("doc_id").reset_index(drop=True))
        local = (d.filter(F.col("text").isNotNull())
                 .select("doc_id", "text").toPandas()
                 .sort_values("doc_id").reset_index(drop=True))
        assert (got["n_tokens"]
                == local["text"].map(tok.token_count)).all()
