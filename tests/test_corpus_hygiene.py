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


# ---------------------------------------------------------------------------
# Property-based invariants (hypothesis) + streaming-transform parity
# ---------------------------------------------------------------------------

from collections import Counter

from hypothesis import given, settings, strategies as st

_word = st.text(alphabet="abcxyz019", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=40)


def _ref_repetition(words):
    nw = len(words)
    dw = 0.0 if nw == 0 else 1.0 - len(set(words)) / nw
    g2 = [" ".join(words[i : i + 2]) for i in range(nw - 1)]
    g3 = [" ".join(words[i : i + 3]) for i in range(nw - 2)]
    tb = 0.0 if not g2 else max(Counter(g2).values()) / len(g2)
    c3 = Counter(g3)
    dt = 0.0 if not g3 else sum(v for v in c3.values() if v >= 2) / len(g3)
    return round(dw, 6), round(tb, 6), round(dt, 6)


@given(st.lists(_doc, min_size=1, max_size=8))
@settings(max_examples=5, deadline=None)
def test_repetition_matches_python_reference(spark, docs):
    """For ANY token stream the three fractions equal a Counter-based pure
    Python reference (tokens restricted to [a-z0-9] so words_expr's
    tokenization is the identity)."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_filter(df).collect()}
    for i, ws in enumerate(docs):
        dw, tb, dt = _ref_repetition(ws)
        r = got[i]
        assert (r["dup_word_frac"], r["top_bigram_frac"], r["dup_trigram_frac"]) == (
            dw, tb, dt
        ), (i, ws)
        for v in (r["dup_word_frac"], r["top_bigram_frac"], r["dup_trigram_frac"]):
            assert 0.0 <= v <= 1.0


@given(
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=2, max_value=20),
    st.integers(min_value=1, max_value=19),
)
@settings(max_examples=5, deadline=None)
def test_chunk_layout_matches_reference(spark, n_words, chunk_words, stride):
    """For ANY (length, width, stride) with stride < width: predicted
    start/width layout, full coverage, and per-pair overlap width -
    stride."""
    if stride >= chunk_words:
        stride = chunk_words - 1
    words = [f"t{i}" for i in range(1, n_words + 1)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_words=chunk_words, stride=stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    if n_words == 0:
        assert rows == []
        return
    starts = list(range(1, max(n_words - (chunk_words - stride), 1) + 1, stride))
    expect = [
        (k, s, min(chunk_words, n_words - s + 1)) for k, s in enumerate(starts)
    ]
    assert [(r["chunk_idx"], r["start_word"], r["n_words"]) for r in rows] == expect
    # coverage: every word position falls inside at least one chunk
    covered = set()
    for _, s, w in expect:
        covered.update(range(s, s + w))
    assert covered == set(range(1, n_words + 1))


def test_chunking_runs_as_streaming_transform(spark, sf_dir, tmp_path):
    """chunk_documents is a stateless generate/project, so the identical
    code must run unchanged as a Structured Streaming micro-batch
    transform (continuous chunking into a RAG/tokenizer sink)."""
    src = str(tmp_path / "docs")
    batch = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    batch.select("doc_id", "text").write.parquet(src)

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    chunked = chunk_documents(stream)
    assert chunked.isStreaming
    out = []
    q = (
        chunked.writeStream.foreachBatch(lambda df, _id: out.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    expect = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(batch.select("doc_id", "text")).collect()
    }
    assert len(out) == len(expect) > 0
    for r in out:
        assert r["chunk_md5"] == expect[(r["doc_id"], r["chunk_idx"])]["chunk_md5"]


def test_chunking_rejects_gapping_stride(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest as _pt

    with _pt.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_words=32, stride=48)
    with _pt.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_words=32, stride=0)


def test_repetition_map_path_is_bit_identical(spark, sf_dir):
    """The zero-shuffle mapInPandas variant must agree with the expression
    path EXACTLY (including the 6-dp rounded fractions and the keep
    verdict) on the driver row's planted corpus — the expr path stays the
    oracle twin, so any divergence here breaks the chain of evidence."""
    from pyspark.sql import functions as F

    from automem_spark.operators.textquality import repetition_filter_map

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    planted = docs.select(
        "doc_id",
        F.when(d % 7 == 0, F.concat(F.col("text"), F.repeat(F.lit(" spark graft"), 30)))
        .when(d % 7 == 1, F.concat_ws(" ", F.col("text"), F.col("text"), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    cols = ["doc_id", "dup_word_frac", "top_bigram_frac", "dup_trigram_frac", "keep"]
    expr_rows = {r.doc_id: r for r in repetition_filter(planted).select(*cols).collect()}
    map_rows = {r.doc_id: r for r in repetition_filter_map(planted).select(*cols).collect()}
    assert set(expr_rows) == set(map_rows)
    for did, er in expr_rows.items():
        mr = map_rows[did]
        assert (er.dup_word_frac, er.top_bigram_frac, er.dup_trigram_frac, er.keep) == (
            mr.dup_word_frac, mr.top_bigram_frac, mr.dup_trigram_frac, mr.keep
        ), f"doc {did}: expr={er} map={mr}"


def test_repetition_map_path_zero_shuffle(spark):
    """The map variant's plan must contain NO exchange — that is its entire
    reason to exist (the expr path shuffles the token stream ~3x)."""
    from automem_spark.operators.textquality import repetition_filter_map

    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "x y z")], "doc_id long, text string"
    )
    plan = repetition_filter_map(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_repetition_map_rejects_output_column_clash(spark):
    from automem_spark.operators.textquality import repetition_filter_map

    df = spark.createDataFrame([(1, "a", True)], "doc_id long, text string, keep boolean")
    with pytest.raises(ValueError, match="collide"):
        repetition_filter_map(df)
