"""Equivalence pins for the tier-1 classifier's two builds.

`classify_memory_expr` (the Column reference twin) and
`classify_memory_fast` (the one-`F.expr` SQL fast path) must be
bit-identical — type AND confidence — on the real corpus and on
adversarial content (nulls, regex metacharacters, multi-pattern hits,
the Habit negative lookahead).

Reference: automem/classification/memory_classifier.py:13-140.
"""

from pyspark.sql import functions as F

from automem_spark.operators.enrichment import (
    classify_memory_expr,
    classify_memory_fast,
)
from automem_spark.sources.tables import load_table

ADVERSARIAL = [
    None,
    "",
    "   ",
    "decided to go with spark",                       # Decision, 2 hits
    "decided to, chose x over y, going with, picked", # Decision, 4 hits (conf cap path)
    "always use tabs",                                # Preference (lookahead: NOT Habit)
    "always brush teeth",                             # Habit (\\balways\\b without 'use')
    "i usually prefer tea",                           # Pattern beats Preference (order)
    "realized the answer during review",              # Insight beats Context (order)
    "nothing matches here at all zzz",                # fallback Memory/0.3
    "regex specials . * + ? ( ) [ ] { } | ^ $ \\",    # must not break parsing
    "DECIDED TO uppercase",                           # lower() applied first
    "café decided to unicode",                        # non-ascii content
    "when during while working on",                   # Context multi-hit
]


def test_classify_fast_bit_identical_adversarial(spark):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(ADVERSARIAL)], "id long, content string"
    )
    tree = classify_memory_expr(F.col("content"))
    rows = (
        classify_memory_fast(df, F.col("content"), "fast")
        .withColumn("tree", tree)
        .select("id", "content", "fast", "tree")
        .collect()
    )
    for r in rows:
        assert r["fast"] == r["tree"], (r["id"], r["content"], r["fast"], r["tree"])


def test_classify_fast_bit_identical_on_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    tree = classify_memory_expr(F.col("text"))
    n_diff = (
        classify_memory_fast(docs, F.col("text"), "fast")
        .withColumn("tree", tree)
        .filter(
            (F.col("fast")["type"] != F.col("tree")["type"])
            | (F.col("fast")["confidence"] != F.col("tree")["confidence"])
        )
        .count()
    )
    assert n_diff == 0


def test_classify_fast_schema(spark):
    df = spark.createDataFrame([(1, "decided to x")], "id long, content string")
    out = classify_memory_fast(df, F.col("content"), "cls")
    field = dict(zip(out.schema.names, out.schema.fields))["cls"]
    assert field.dataType.simpleString() == "struct<type:string,confidence:double>"
    assert "_cls_in" not in out.columns
