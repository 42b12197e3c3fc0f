"""Gate tests for the round-2 text-quality extensions:
repetition-ratio stats (Gopher/C4 rule family) and benchmark
decontamination flags.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iotdatapipeline_spark.plans import ORACLE, QUERIES
from iotdatapipeline_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestRepetitionStats:
    def test_registered_with_oracle(self):
        assert "docs_repetition_stats" in QUERIES
        assert "docs_repetition_stats" in ORACLE

    def test_zero_shuffle_pure_projection(self, spark, sf_small):
        # the whole query must be map-side: one scan, no Exchange at
        # all — the property that makes it free at 100 TB
        plan = _plan(QUERIES["docs_repetition_stats"](spark, sf_small))
        assert "Exchange" not in plan, plan

    def test_ratios_bounded_and_consistent(self, spark, sf_small):
        df = QUERIES["docs_repetition_stats"](spark, sf_small)
        n_docs = load_table(spark, sf_small, "documents").count()
        assert df.count() == n_docs
        bad = df.filter(
            (F.col("dup_word_x1000") < 0) | (F.col("dup_word_x1000") > 1000)
            | (F.col("dup_2gram_x1000") < 0) | (F.col("dup_2gram_x1000") > 1000)
            | (F.col("dup_3gram_x1000") < 0) | (F.col("dup_3gram_x1000") > 1000)
            | (F.col("top_word_x1000") <= 0) | (F.col("top_word_x1000") > 1000)
            | (F.col("n_distinct_words") > F.col("n_words"))
        )
        assert bad.count() == 0

    def test_degenerate_doc_scores_maximal(self, spark):
        # a fully repeated doc: dup ratios ~max, top word = 100%
        df = spark.createDataFrame(
            [(1, "spam " * 9 + "spam"), (2, "a b c d e f g h i j")], ["doc_id", "text"]
        )
        import iotdatapipeline_spark.plans.analytics as A

        orig = A.load_table
        try:
            A.load_table = lambda sp, sf, name: df
            out = {r["doc_id"]: r for r in QUERIES["docs_repetition_stats"](None, "x").collect()}
        finally:
            A.load_table = orig
        assert out[1]["top_word_x1000"] == 1000
        assert out[1]["dup_word_x1000"] == 900  # 10 words, 1 distinct
        assert out[2]["dup_word_x1000"] == 0
        assert out[2]["dup_2gram_x1000"] == 0


class TestContamination:
    def test_registered_with_oracle(self):
        assert "docs_contamination_flags" in QUERIES
        assert "docs_contamination_flags" in ORACLE

    def test_eval_docs_never_flagged(self, spark, sf_small):
        df = QUERIES["docs_contamination_flags"](spark, sf_small)
        assert df.filter(F.col("doc_id") % 50 == 0).count() == 0

    def test_flagged_docs_share_a_4gram(self, spark, sf_small):
        # every flagged doc really does share a 4-gram with some eval
        # doc (re-derived independently with a different construction)
        df = QUERIES["docs_contamination_flags"](spark, sf_small)
        docs = load_table(spark, sf_small, "documents").select(
            "doc_id", F.split(F.col("text"), " ").alias("ws")
        )
        g = docs.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.array_size("ws") - 3, F.lit(1))),
                    lambda i: F.array_join(F.slice(F.col("ws"), i, 4), " "),
                )
            ).alias("ng"),
        ).distinct()
        ev = g.filter(F.col("doc_id") % 50 == 0).select("ng").distinct()
        expect = (
            g.filter(F.col("doc_id") % 50 != 0)
            .join(ev, "ng")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        diff = df.join(expect, "doc_id", "full").filter(
            F.col("n_shared_4grams").isNull()
            | F.col("n").isNull()
            | (F.col("n_shared_4grams") != F.col("n"))
        )
        assert diff.count() == 0

    def test_broadcast_no_corpus_shuffle_join(self, spark, sf_small):
        # the eval side must broadcast: no SortMergeJoin of the corpus
        plan = _plan(QUERIES["docs_contamination_flags"](spark, sf_small))
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan


class TestInt8Quantize:
    def test_registered_with_oracle(self):
        assert "embeddings_int8_quantize" in QUERIES
        assert "embeddings_int8_quantize" in ORACLE

    def test_zero_shuffle_pure_projection(self, spark, sf_small):
        plan = _plan(QUERIES["embeddings_int8_quantize"](spark, sf_small))
        assert "Exchange" not in plan, plan

    def test_code_invariants(self, spark, sf_small):
        df = QUERIES["embeddings_int8_quantize"](spark, sf_small)
        n = load_table(spark, sf_small, "embeddings").count()
        assert df.count() == n
        # the max-|x| component always quantizes to ±127, so every
        # vector saturates at least once; energy is bounded by d·127²
        bad = df.filter(
            (F.col("n_sat") < 1)
            | (F.col("sum_q2") > 64 * 127 * 127)
            | (F.col("sum_q2") < 127 * 127)
            | (F.col("amax_x1e6") <= 0)
        )
        assert bad.count() == 0


class TestSourceMixing:
    def test_registered_with_oracle(self):
        assert "docs_source_mixing" in QUERIES
        assert "docs_source_mixing" in ORACLE

    def test_budget_conserved_and_weights_flatten(self, spark, sf_small):
        rows = QUERIES["docs_source_mixing"](spark, sf_small).collect()
        docs = load_table(spark, sf_small, "documents")
        assert {r["source"] for r in rows} == {
            r["source"] for r in docs.select("source").distinct().collect()
        }
        total_target = sum(r["target_docs"] for r in rows)
        # floored shares can undershoot by at most one per source
        assert 100_000 - len(rows) <= total_target <= 100_000
        for r in rows:
            assert r["weight_isqrt"] == int(r["total_words"] ** 0.5)


class TestBloomProbe:
    def test_registered_with_oracle(self):
        assert "parts_bloom_probe" in QUERIES
        assert "parts_bloom_probe" in ORACLE

    def test_no_false_negatives_and_bounded_fp(self, spark, sf_small):
        # THE Bloom guarantee: a member is never missed; and at this
        # geometry (1024 bits / 3 hashes / ~200 keys) the FP rate on
        # ~900 non-members must stay in single-digit percent
        rows = QUERIES["parts_bloom_probe"](spark, sf_small).collect()
        assert all(r["bloom_hit"] for r in rows if r["actual_in"])
        neg = [r for r in rows if not r["actual_in"]]
        fp = sum(1 for r in neg if r["bloom_hit"])
        assert len(neg) > 0
        assert fp / len(neg) < 0.10, (fp, len(neg))
        # false_positive column is consistent with the two flags
        assert all(
            r["false_positive"] == (r["bloom_hit"] and not r["actual_in"]) for r in rows
        )

    def test_probe_never_sortmerge_joins(self, spark, sf_small):
        plan = _plan(QUERIES["parts_bloom_probe"](spark, sf_small))
        assert "SortMergeJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_operator_roundtrip_tiny(self, spark):
        from iotdatapipeline_spark.operators.bloom import bloom_build, bloom_probe

        keys = spark.createDataFrame([("alpha",), ("beta",), ("gamma",)], ["k"])
        bloom = bloom_build(keys, "k")
        probe = spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",), ("delta",), ("epsilon",)], ["k"]
        )
        got = {r["k"]: r["bloom_hit"] for r in bloom_probe(probe, bloom, "k").collect()}
        assert got["alpha"] and got["beta"] and got["gamma"]


class TestCdcChunkDedup:
    def test_registered_with_oracle(self):
        assert "docs_cdc_chunk_dedup" in QUERIES
        assert "docs_cdc_chunk_dedup" in ORACLE

    def test_chunks_partition_documents(self, spark, sf_small):
        # re-derive all chunks (not just shared ones) and check the
        # CDC invariant: concatenating a doc's chunks in chunk_id
        # order reproduces the document exactly
        docs = load_table(spark, sf_small, "documents")
        w = docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "word"),
        ).select(
            "doc_id",
            (F.col("pos0") + 1).alias("pos"),
            "word",
            F.when(
                F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10).cast("long") % 8
                == 0,
                1,
            )
            .otherwise(0)
            .alias("bnd"),
        )
        from pyspark.sql import Window

        win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
            Window.unboundedPreceding, -1
        )
        c = w.withColumn("chunk_id", F.coalesce(F.sum("bnd").over(win), F.lit(0)))
        chunks = c.groupBy("doc_id", "chunk_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
                " ",
            ).alias("chunk")
        )
        rebuilt = chunks.groupBy("doc_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("rebuilt")
        )
        diff = rebuilt.join(docs, "doc_id").filter(F.col("rebuilt") != F.col("text"))
        assert diff.count() == 0

    def test_shared_chunks_really_shared(self, spark, sf_small):
        df = QUERIES["docs_cdc_chunk_dedup"](spark, sf_small)
        assert df.count() > 0
        bad = df.filter((F.col("n_docs") < 2) | (F.col("n_copies") < F.col("n_docs")))
        assert bad.count() == 0


class TestBpePairCounts:
    def test_registered_with_oracle(self):
        assert "docs_bpe_pair_counts" in QUERIES
        assert "docs_bpe_pair_counts" in ORACLE

    def test_topk_shape_and_counts(self, spark, sf_small):
        rows = QUERIES["docs_bpe_pair_counts"](spark, sf_small).collect()
        assert len(rows) == 20
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
            range(1, 21)
        )
        # ranking is by count desc then pair asc; all pairs 2 chars
        ordered = sorted(rows, key=lambda r: r["rank"])
        for a, b in zip(ordered, ordered[1:]):
            assert (a["n_occurrences"], b["pair"]) >= (b["n_occurrences"], a["pair"])
        assert all(len(r["pair"]) == 2 for r in rows)

    def test_counts_match_brute_force(self, spark, sf_small):
        # brute-force recount of the top pair via plain python
        rows = QUERIES["docs_bpe_pair_counts"](spark, sf_small).collect()
        top = max(rows, key=lambda r: (r["n_occurrences"], -r["rank"]))
        docs = [r["text"] for r in load_table(spark, sf_small, "documents").collect()]
        n = 0
        for t in docs:
            for w in t.split(" "):
                for i in range(len(w) - 1):
                    if w[i : i + 2] == top["pair"]:
                        n += 1
        assert n == top["n_occurrences"]


class TestPrefixFilterCompleteness:
    def test_no_jaccard_half_pair_missed(self, spark, sf_small):
        """Empirical check of the prefix-filtering theorem the plan
        relies on: the registered query's output pair set must equal
        the brute-force set of ALL Jaccard-≥0.5 pairs (computed
        without any prefix pruning). A miss means the prefix length
        arithmetic drifted; an extra means the verify filter did."""
        import duckdb

        from iotdatapipeline_spark.plans import QUERIES

        got = {
            (r.id1, r.id2)
            for r in QUERIES["docs_prefix_filter_pairs"](spark, sf_small).collect()
        }
        con = duckdb.connect()
        con.sql(
            f"create view documents as select * from '{sf_small}/documents.parquet'"
        )
        want = {
            tuple(r)
            for r in con.sql(
                """
                WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
                pos AS (SELECT doc_id, ws,
                               unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS i
                        FROM ws),
                sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle
                       FROM pos),
                m AS (SELECT doc_id, count(*) AS m FROM sh GROUP BY doc_id),
                inter AS (
                    SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
                    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                    GROUP BY 1, 2
                )
                SELECT id1, id2
                FROM inter JOIN m m1 ON m1.doc_id = id1 JOIN m m2 ON m2.doc_id = id2
                WHERE 1000 * i >= 500 * (m1.m + m2.m - i)
                """
            ).fetchall()
        }
        assert got == want
        assert len(want) > 0  # the fixture actually contains near-dups


class TestDsirWeights:
    """docs_dsir_weights: hashed-bigram importance weights, target =
    the lang='en' slice. The weight must actually separate target-like
    documents from the rest (the property DSIR selection relies on),
    and the plan must broadcast the 256-row score table (no shuffle of
    the gram stream against it)."""

    def test_weights_separate_target_from_rest(self, spark, sf_small):
        docs = load_table(spark, sf_small, "documents").select("doc_id", "lang")
        w = QUERIES["docs_dsir_weights"](spark, sf_small)
        j = w.join(docs, "doc_id").select(
            "lang", (F.col("dsir_weight") / F.col("n_grams")).alias("per_gram")
        )
        avg = {
            r["lang"]: r["a"]
            for r in j.groupBy("lang").agg(F.avg("per_gram").alias("a")).collect()
        }
        others = [v for k, v in avg.items() if k != "en"]
        assert avg["en"] > max(others)  # target slice scores highest

    def test_weights_positive_and_cover_all_docs(self, spark, sf_small):
        w = QUERIES["docs_dsir_weights"](spark, sf_small)
        n_docs = load_table(spark, sf_small, "documents").count()
        rows = w.collect()
        assert len(rows) == n_docs
        assert all(r["dsir_weight"] > 0 and r["n_grams"] > 0 for r in rows)

    def test_model_is_broadcast_and_grams_never_shuffle(self, spark, sf_small):
        """r8 shape, scoring reworked r13: the 256-score model folds to
        ONE row and broadcasts under every document (nested-loop join
        with a 1-row build side) — the gram stream never joins or
        shuffles against it. The per-doc aggregate MAY exchange, but
        only map-side-combined partials (one (doc_id, count, sum) row
        per doc per task), never gram rows: the doc_id exchange must
        sit above a partial hash aggregate."""
        plan = _plan(QUERIES["docs_dsir_weights"](spark, sf_small))
        assert "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
        # partial (map-side) aggregation below the doc_id exchange —
        # the shuffle carries per-doc partials, not the gram stream
        if "hashpartitioning(doc_id" in plan:
            assert "partial_sum" in plan, plan


class TestQualityClassifier:
    """docs_quality_classifier: fixed linear model over integer
    features — must be a pure projection (no shuffle: the filter runs
    at scan speed) with a non-degenerate decision boundary."""

    def test_zero_shuffle_projection(self, spark, sf_small):
        plan = _plan(QUERIES["docs_quality_classifier"](spark, sf_small))
        assert "Exchange" not in plan

    def test_boundary_is_exercised(self, spark, sf_small):
        rows = QUERIES["docs_quality_classifier"](spark, sf_small).collect()
        labels = {r["label"] for r in rows}
        assert labels == {"keep", "drop"}  # both sides of the threshold
        for r in rows:
            assert (r["score"] >= 1000) == (r["label"] == "keep")
