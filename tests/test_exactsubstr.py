"""Gate tests for exact-substring span dedup
(`docs_duplicate_ngram_spans`): span boundaries on a constructed
corpus, the short-doc guard, and the plan shape that makes the pass
linear in total tokens.
"""

from __future__ import annotations

import pytest

from iotdatapipeline_spark.plans import ORACLE, QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def toy_dir(spark, tmp_path_factory):
    """documents.parquet where docs 1 and 2 share one verbatim
    12-token passage and nothing else; doc 3 is unique; doc 4 is
    shorter than the gram width."""
    shared = [f"s{i}" for i in range(12)]
    rows = [
        (1, " ".join([f"a{i}" for i in range(4)] + shared + [f"a{i}" for i in range(4, 8)])),
        (2, " ".join([f"b{i}" for i in range(3)] + shared + [f"b{i}" for i in range(3, 5)])),
        (3, " ".join([f"c{i}" for i in range(20)])),
        (4, " ".join([f"d{i}" for i in range(5)])),
    ]
    d = str(tmp_path_factory.mktemp("exactsubstr"))
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


class TestDuplicateNgramSpans:
    def test_registered_with_oracle(self):
        assert "docs_duplicate_ngram_spans" in QUERIES
        assert "docs_duplicate_ngram_spans" in ORACLE

    def test_span_boundaries_exact(self, spark, toy_dir):
        # shared run: doc 1 positions 5..16 (1-based), doc 2 positions
        # 4..15; 8-grams fully inside the run start at 5 of them each
        out = {
            (r.doc_id): (r.span_start, r.span_end, r.n_tokens, r.n_grams)
            for r in QUERIES["docs_duplicate_ngram_spans"](spark, toy_dir).collect()
        }
        assert out == {1: (5, 16, 12, 5), 2: (4, 15, 12, 5)}

    def test_no_quadratic_stage(self, spark, sf_small):
        plan = _plan(QUERIES["docs_duplicate_ngram_spans"](spark, sf_small))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan

    def test_nonempty_at_gate_scale(self, spark, sf_oracle):
        assert QUERIES["docs_duplicate_ngram_spans"](spark, sf_oracle).count() > 0
