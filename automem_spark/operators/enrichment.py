"""Enrichment operators: regex-tier type classification (U3 tier 1) and
batch pattern detection (A7).

Reference:
- classifier tier 1: automem/classification/memory_classifier.py:13-140 —
  first type (declaration order) with any regex hit; confidence 0.6, or
  min(0.95, 0.6 + matches*0.1) when >1 pattern of that type hits; fallback
  ("Memory", 0.3). Tier 2 (LLM) is non-deterministic and excluded from the
  correctness gate; tier 1 is the default here.
- pattern detection: automem/enrichment/runtime_helpers.py:74-174 — per type
  with >= 4 confident members (confidence > 0.5): token Counter over
  [a-zA-Z]{4,} lowercased tokens minus stopwords, top-5 terms.

Both are pure column expressions / one groupBy — classification runs at scan
speed inside codegen; pattern detection is explode + two-level agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from automem_spark.functions.text import SEARCH_STOPWORDS
from automem_spark.operators.topk import top_k_per_group

# Tier-1 patterns, verbatim semantics from memory_classifier.py:13-77
# (Java regex handles the Habit negative lookahead natively).
CLASSIFIER_PATTERNS: dict[str, list[str]] = {
    "Decision": [
        r"decided to", r"chose (\w+) over", r"going with", r"picked",
        r"selected", r"will use", r"choosing", r"opted for",
    ],
    "Pattern": [
        r"usually", r"typically", r"tend to", r"pattern i noticed",
        r"often", r"frequently", r"regularly", r"consistently",
    ],
    "Preference": [
        r"prefer", r"like.*better", r"favorite", r"always use",
        r"rather than", r"instead of", r"favor",
    ],
    "Style": [
        r"wrote.*in.*style", r"communicated", r"responded to",
        r"formatted as", r"using.*tone", r"expressed as",
    ],
    "Habit": [
        r"\balways\b(?!\s+use\b)", r"every time", r"habitually",
        r"routine", r"daily", r"weekly", r"monthly",
    ],
    "Insight": [
        r"realized", r"discovered", r"learned that", r"understood",
        r"figured out", r"insight", r"revelation",
    ],
    "Context": [
        r"during", r"while working on", r"in the context of", r"when",
        r"at the time", r"situation was",
    ],
}


def classify_memory_expr(content: Column) -> Column:
    """struct(type, confidence) per tier-1 semantics. The whole classifier is
    one CASE chain of rlike()s — no UDF. This Column tree is the reference
    twin; the SQL fast path below is pinned bit-identical to it."""
    lower = F.lower(F.coalesce(content, F.lit("")))
    result: Column | None = None
    for mem_type, patterns in CLASSIFIER_PATTERNS.items():
        hits = [lower.rlike(p).cast("int") for p in patterns]
        n_matches = sum(hits[1:], hits[0])
        any_match = n_matches > 0
        conf = F.when(
            n_matches > 1, F.least(F.lit(0.95), 0.6 + n_matches * 0.1)
        ).otherwise(F.lit(0.6))
        branch = F.struct(F.lit(mem_type).alias("type"), conf.alias("confidence"))
        result = F.when(any_match, branch) if result is None else result.when(any_match, branch)
    return result.otherwise(
        F.struct(F.lit("Memory").alias("type"), F.lit(0.3).alias("confidence"))
    )


def _classify_memory_sql(input_sql: str) -> str:
    """The tier-1 classifier as Spark-SQL text over `input_sql`.

    The Column tree costs ~0.4s of py4j round-trips per query (≈50 rlike
    nodes built one RPC at a time); the patterns are static, so the SQL
    text is assembled once per process and parses in one `F.expr`.
    Let-bindings keep analysis and row evaluation linear: `s` binds the
    lowered content (one fold per row), `ns` binds the 7-element per-type
    match-count vector (each rlike runs once per row)."""

    def lit(p: str) -> str:
        return "'" + p.replace("\\", "\\\\").replace("'", "''") + "'"

    counts = []
    for patterns in CLASSIFIER_PATTERNS.values():
        counts.append(
            " + ".join(
                f"(CASE WHEN s rlike {lit(p)} THEN 1 ELSE 0 END)" for p in patterns
            )
        )
    branches = []
    for i, mem_type in enumerate(CLASSIFIER_PATTERNS, start=1):
        n = f"element_at(ns, {i})"
        conf = (
            f"CASE WHEN {n} > 1 THEN least(CAST(0.95 AS DOUBLE),"
            f" CAST(0.6 AS DOUBLE) + {n} * CAST(0.1 AS DOUBLE))"
            f" ELSE CAST(0.6 AS DOUBLE) END"
        )
        branches.append(
            f"WHEN {n} > 0 THEN named_struct('type', '{mem_type}',"
            f" 'confidence', {conf})"
        )
    chain = (
        "CASE " + " ".join(branches)
        + " ELSE named_struct('type', 'Memory', 'confidence',"
        " CAST(0.3 AS DOUBLE)) END"
    )
    return (
        f"element_at(transform(array(lower(coalesce({input_sql}, ''))), s ->"
        f" element_at(transform(array(array({', '.join(counts)})), ns ->"
        f" {chain}), 1)), 1)"
    )


_CLASSIFY_SQL_FAST = None  # assembled on first use; patterns are static


def classify_memory_fast(df: DataFrame, content: Column, out_col: str) -> DataFrame:
    """`df.withColumn(out_col, classify_memory_expr(content))` via the
    one-`F.expr` fast path. `content` may be any Column: it is staged as a
    temporary column so the static SQL text can reference it by name."""
    global _CLASSIFY_SQL_FAST
    if _CLASSIFY_SQL_FAST is None:
        _CLASSIFY_SQL_FAST = _classify_memory_sql("`_cls_in`")
    # the staging column would silently overwrite-and-drop a caller column
    # of the same name (advisor r10); out_col == staging would self-destroy
    if "_cls_in" in df.columns:
        raise ValueError(
            "classify_memory_fast: input already has a '_cls_in' column "
            "(reserved staging name); rename it before classifying"
        )
    if out_col == "_cls_in":
        raise ValueError("classify_memory_fast: out_col may not be '_cls_in'")
    return (
        df.withColumn("_cls_in", content)
        .withColumn(out_col, F.expr(_CLASSIFY_SQL_FAST))
        .drop("_cls_in")
    )


def detect_patterns_batch(
    memories: DataFrame,
    *,
    content_col: str = "content",
    type_col: str = "type",
    confidence_col: str = "confidence",
    min_members: int = 4,
    min_confidence: float = 0.5,
    top_terms: int = 5,
) -> DataFrame:
    """A7 batch: per type with >= min_members confident rows, the top-5
    [a-zA-Z]{4,} tokens (stopwords removed, counted with multiplicity).

    Output: (type, n_members, term, term_count, rank). The reference runs
    this per-new-memory against up-to-10 peers; the batch form computes the
    same statistic corpus-wide in one explode + count + window.
    """
    confident = memories.filter(F.col(confidence_col) > min_confidence)
    sizes = confident.groupBy(type_col).agg(F.count("*").alias("n_members")).filter(
        F.col("n_members") >= min_members
    )
    stop = F.array(*[F.lit(s) for s in sorted(SEARCH_STOPWORDS)])
    # NB: filter() not array_except() — the Counter counts occurrences with
    # multiplicity and array_except would dedup.
    tokens = confident.join(F.broadcast(sizes), type_col).select(
        type_col,
        "n_members",
        F.explode(
            F.filter(
                F.regexp_extract_all(
                    F.lower(F.col(content_col)), F.lit("[a-zA-Z]{4,}"), 0
                ),
                lambda t: ~F.array_contains(stop, t),
            )
        ).alias("term"),
    )
    counts = tokens.groupBy(type_col, "n_members", "term").agg(
        F.count("*").alias("term_count")
    )
    return top_k_per_group(
        counts,
        [type_col],
        [F.desc("term_count"), F.asc("term")],
        top_terms,
        rank_col="rank",
        keep_rank=True,
    )
