"""U2 entity extraction: Spark <-> DuckDB oracle parity, plus a behavioral
fidelity check against the reference implementation itself (loaded from
/root/reference as a test oracle — skipped when absent)."""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import duckdb
import pytest

from automem_spark.operators.entity_extract import (
    extract_entities,
    extract_entities_oracle_sql,
)
from automem_spark.sources.tables import (
    ENTITY_FIXTURE_ORACLE_CTE,
    entity_fixture_view,
)

SF_DIR = "/root/testdata/sf0.001"
REF_DIR = "/root/reference"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


def test_spark_matches_duckdb_oracle(spark, duck):
    res = extract_entities(entity_fixture_view(spark, SF_DIR))
    srows = sorted(tuple(r) for r in res.collect())
    orows = sorted(
        tuple(r)
        for r in duck.execute(
            extract_entities_oracle_sql(ENTITY_FIXTURE_ORACLE_CTE)
        ).fetchall()
    )
    assert len(srows) > 500  # the fixture produces a substantial accept set
    assert srows == orows


def test_rejects_and_category_routing(spark):
    from pyspark.sql import Row

    mem = spark.createDataFrame(
        [
            Row(id=1, content="Met with Alice Johnson. Using TokenManager."),
            Row(id=2, content="Configured via HTTP_PROXY and using notebooks."),
            Row(id=3, content="Paired with Gemini on it. Also using Gemini."),
            Row(id=4, content='project called "Neon Sky" and `DataPipeline`.'),
        ]
    )
    rows = {
        (r.id, r.category, r.name)
        for r in extract_entities(mem).collect()
    }
    assert (1, "people", "Alice Johnson") in rows
    assert not any(n == "TokenManager" for _, _, n in rows)  # code suffix
    assert not any(n == "HTTP_PROXY" for _, _, n in rows)  # env-var shape
    assert not any(n == "notebooks" for _, _, n in rows)  # lowercase
    # Gemini accepted as people; the tools copy is removed (tools -= people)
    assert (3, "people", "Gemini") in rows
    assert (3, "tools", "Gemini") not in rows
    assert (4, "projects", "Neon Sky") in rows
    assert (4, "projects", "DataPipeline") in rows


@pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not available"
)
def test_fidelity_vs_reference(duck):
    """Run the reference's own extract_entities() per fixture row and demand
    the (id, category, name) set is identical to the oracle pipeline."""

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    for pkg_name in ("automem", "automem.utils"):
        if pkg_name not in sys.modules:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = []
            sys.modules[pkg_name] = pkg
    load(
        "automem.utils.entity_quality",
        f"{REF_DIR}/automem/utils/entity_quality.py",
    )
    ee = load(
        "automem.utils.entity_extraction",
        f"{REF_DIR}/automem/utils/entity_extraction.py",
    )
    txt = load("_ref_text", f"{REF_DIR}/automem/utils/text.py")
    ee.configure_entity_extraction(
        search_stopwords=txt.SEARCH_STOPWORDS,
        entity_stopwords=txt.ENTITY_STOPWORDS,
        entity_blocklist=txt.ENTITY_BLOCKLIST,
        spacy_model="en_core_web_sm",
    )

    fixture = duck.execute(
        "WITH " + ENTITY_FIXTURE_ORACLE_CTE.strip() + " SELECT id, content FROM amem"
    ).fetchall()
    ref = {
        (rid, cat, v)
        for rid, content in fixture
        for cat, vals in ee.extract_entities(content).items()
        for v in vals
    }
    mine = {
        (r[0], r[1], r[2])
        for r in duck.execute(
            extract_entities_oracle_sql(ENTITY_FIXTURE_ORACLE_CTE)
        ).fetchall()
    }
    assert ref == mine
