"""Round-7 corpus-hygiene operators: Gopher-style repetition filtering
(textquality.repetition_filter) and overlapping context-window chunking
(trainprep.chunk_documents). Both are driver rows (repetition_filter,
doc_chunks) with exact DuckDB oracles; these tests pin the hand-checkable
semantics the oracle can't articulate (formulas on known word streams,
coverage/overlap invariants, guard rails)."""

import pytest
from pyspark.sql import functions as F

from automem_spark.operators.textquality import repetition_filter
from automem_spark.operators.trainprep import chunk_documents


def _row(spark, text, doc_id=1):
    df = spark.createDataFrame([(doc_id, text)], "doc_id long, text string")
    return repetition_filter(df).collect()[0]


def test_repetition_fractions_hand_checked(spark):
    # 6 words, 3 distinct -> dup_word 1 - 3/6; bigrams: "a b","b a","a b",
    # "b c","c c" -> top "a b" = 2/5; trigrams: all 4 distinct -> dup 0
    r = _row(spark, "a b a b c c")
    assert r["dup_word_frac"] == pytest.approx(1 - 3 / 6, abs=1e-6)
    assert r["top_bigram_frac"] == pytest.approx(2 / 5, abs=1e-6)
    assert r["dup_trigram_frac"] == 0.0
    assert not r["keep"]  # top-bigram 0.4 > 0.18 ceiling

    # clean stream: everything distinct, keeps
    r2 = _row(spark, "one two three four five six seven")
    assert r2["dup_word_frac"] < 0.01 and r2["keep"]

    # self-concatenation: every trigram (except the seam) repeats
    r3 = _row(spark, "p q r s t p q r s t")
    assert r3["dup_trigram_frac"] > 0.5
    assert not r3["keep"]


def test_repetition_degenerate_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "solo"), (4, "two words")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_filter(df).collect()}
    for i in (1, 2, 3, 4):
        assert out[i]["dup_word_frac"] == 0.0
        assert out[i]["top_bigram_frac"] in (0.0, 1.0)  # "two words" has 1 bigram
        assert out[i]["dup_trigram_frac"] == 0.0
    assert out[1]["keep"] and out[2]["keep"] and out[3]["keep"]


def test_repetition_rejects_output_column_clash(spark):
    df = spark.createDataFrame([(1, "x", True)], "doc_id long, text string, keep boolean")
    with pytest.raises(ValueError, match="keep"):
        repetition_filter(df)


def test_chunking_overlap_and_full_coverage(spark):
    words = " ".join(f"w{i}" for i in range(1, 101))  # 100 words
    df = spark.createDataFrame([(7, words)], "doc_id long, text string")
    rows = sorted(chunk_documents(df).collect(), key=lambda r: r["chunk_idx"])
    # starts = sequence(1, 100-16=84, 48) = [1, 49]
    assert [(r["chunk_idx"], r["start_word"], r["n_words"]) for r in rows] == [
        (0, 1, 64),
        (1, 49, 52),  # truncated tail, never dropped
    ]
    # consecutive chunks overlap by chunk_words - stride = 16 words, and
    # the union covers every word: 1..64 + 49..100
    assert rows[0]["start_word"] + rows[0]["n_words"] - 1 == 64
    assert rows[1]["start_word"] + rows[1]["n_words"] - 1 == 100
    # md5 ids deterministic across runs
    again = sorted(chunk_documents(df).collect(), key=lambda r: r["chunk_idx"])
    assert [r["chunk_md5"] for r in rows] == [r["chunk_md5"] for r in again]


def test_chunking_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = chunk_documents(df).collect()
    # empty/null docs emit no chunks; a 3-word doc emits exactly one
    assert {r["doc_id"] for r in rows} == {1}
    assert rows[0]["n_words"] == 3 and rows[0]["chunk_idx"] == 0


def test_chunking_custom_width_stride(spark):
    words = " ".join(str(i) for i in range(12))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_words=5, stride=4).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # starts = sequence(1, 12-1=11, 4) = [1, 5, 9]
    assert [(r["start_word"], r["n_words"]) for r in rows] == [(1, 5), (5, 5), (9, 4)]
