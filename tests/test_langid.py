"""Char-trigram language-ID tests (operators/text_analysis.py).

Round-4 verdict item 3: the 4-marker-word toy is replaced by learned
char-trigram frequency profiles (Cavnar-Trenkle shape).  The testdata
documents table carries English-vocabulary shuffles under every lang
label (agreement off-en is structurally impossible there — q46 makes
that visible); REAL multilingual discrimination is pinned here on
held-out prose none of which appears in the seed paragraphs.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extraction_tests_spark.operators import text_analysis as TA

# held-out evaluation prose (disjoint from TA._LANG_SEEDS)
EVAL_SENTENCES = {
    "en": [
        "the committee will review the proposal before the end of the month",
        "she walked through the forest thinking about what he had said",
        "most of the results were published in the spring of that year",
        "a long time ago the river changed its course and the village moved",
    ],
    "de": [
        "die regierung hat beschlossen dass die schulen wieder öffnen",
        "er ging durch den wald und dachte über das gespräch nach",
        "die meisten ergebnisse wurden im frühjahr veröffentlicht",
        "vor langer zeit änderte der fluss seinen lauf und das dorf zog um",
    ],
    "fr": [
        "le gouvernement a décidé que les écoles rouvriraient la semaine prochaine",
        "elle marchait dans la forêt en pensant à ce qu'il avait dit",
        "la plupart des résultats ont été publiés au printemps de cette année",
        "il y a longtemps la rivière a changé de cours et le village a déménagé",
    ],
    "es": [
        "el gobierno ha decidido que las escuelas volverán a abrir la próxima semana",
        "ella caminaba por el bosque pensando en lo que él había dicho",
        "la mayoría de los resultados fueron publicados en la primavera",
        "hace mucho tiempo el río cambió su curso y el pueblo se mudó",
    ],
}


class TestProfiles:
    def test_deterministic_learning(self):
        p1 = TA._learn_trigrams(TA._LANG_SEEDS, TA.N_TRIGRAMS)
        assert p1 == TA.LANG_TRIGRAMS
        for lang, tris in TA.LANG_TRIGRAMS.items():
            assert len(tris) == TA.N_TRIGRAMS
            assert len(set(tris)) == TA.N_TRIGRAMS
            for t in tris:
                assert len(t) == 3
                assert "'" not in t  # SQL-literal safety

    def test_profiles_are_discriminative(self):
        # the same trigram may serve at most a couple of languages; a
        # profile dominated by shared trigrams would be useless
        from collections import Counter
        c = Counter(t for tris in TA.LANG_TRIGRAMS.values() for t in tris)
        assert max(c.values()) == 1  # discriminative scoring => disjoint


class TestHeldOutAgreement:
    @pytest.fixture(scope="class")
    def guessed(self, spark):
        rows = [
            {"doc_id": i, "lang": lang, "text": s}
            for i, (lang, s) in enumerate(
                (lang, s) for lang, ss in EVAL_SENTENCES.items() for s in ss)
        ]
        df = spark.createDataFrame(pd.DataFrame(rows))
        return (TA.with_language_guess(df)
                .select("doc_id", "lang", "lang_guess").toPandas())

    def test_near_one_agreement_per_language(self, guessed):
        # round-4 baseline was ~0 for every non-en language
        for lang in EVAL_SENTENCES:
            g = guessed[guessed["lang"] == lang]
            agree = float((g["lang_guess"] == g["lang"]).mean())
            assert agree == 1.0, (lang, g.to_dict("records"))

    def test_spark_matches_duckdb_oracle(self, spark, guessed):
        import duckdb

        rows = [
            {"doc_id": i, "text": s}
            for i, s in enumerate(
                s for ss in EVAL_SENTENCES.values() for s in ss)
        ]
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows))
        oracle = con.execute(TA.language_guess_sql()).df()
        sdf = spark.createDataFrame(pd.DataFrame(rows))
        got = (TA.with_language_guess(sdf)
               .select("doc_id", "lang_guess").toPandas())
        merged = got.merge(oracle, on="doc_id", suffixes=("_s", "_d"))
        assert (merged["lang_guess_s"] == merged["lang_guess_d"]).all()

    def test_gibberish_is_und(self, spark):
        df = spark.createDataFrame(pd.DataFrame(
            {"doc_id": [0, 1], "text": ["zzz qqq xxx", "0x7f 0x3b 0x11"]}))
        got = TA.with_language_guess(df).select("lang_guess").toPandas()
        assert (got["lang_guess"] == "und").all()
