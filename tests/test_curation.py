"""Behavioral tests for the curation-packaging operators
(queries/curation.py): within-doc dedup semantics, shard determinism and
coverage, data-card arithmetic, bucket composition. Oracle conformance at
sf0.001 is covered by tests/test_queries_oracle.py like every registry
query; these pin the semantics the oracle can't express (idempotence,
determinism across runs, plan shapes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.queries.curation import (
    N_SHARDS,
    SELF_DEDUP_W,
    self_dedup_frame,
    shard_col,
)

from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_self_dedup_removes_repeated_window(spark):
    # "a b c" appears twice; the second occurrence (tokens 4-6) is cut.
    out = self_dedup_frame(
        _docs(spark, [(1, "a b c a b c d")])
    ).collect()[0]
    assert out.n_tokens == 7
    assert out.removed_toks == SELF_DEDUP_W
    assert out.cleaned_text == "a b c d"


def test_self_dedup_keeps_first_occurrence_and_overlaps(spark):
    # Overlapping duplicate windows union their coverage: "x y x y x y"
    # has dup windows at starts 3 ("x y x") and 4 ("y x y"); tokens 3-6 go.
    out = self_dedup_frame(_docs(spark, [(1, "x y x y x y")])).collect()[0]
    assert out.cleaned_text == "x y"
    assert out.removed_toks == 4


def test_self_dedup_untouched_doc_round_trips(spark):
    text = "the quick brown fox jumps over the lazy dog"
    out = self_dedup_frame(_docs(spark, [(1, text)])).collect()[0]
    assert out.removed_toks == 0
    assert out.cleaned_text == text


def test_self_dedup_short_and_empty_docs(spark):
    rows = self_dedup_frame(
        _docs(spark, [(1, "a b"), (2, ""), (3, "   ")])
    ).orderBy("doc_id").collect()
    assert [r.removed_toks for r in rows] == [0, 0, 0]
    assert rows[0].cleaned_text == "a b"
    # zero-token docs clean to NULL, not '' (r15 contract: the oracle's
    # array_to_string over an empty kept list is NULL)
    assert rows[1].cleaned_text is None
    assert rows[2].cleaned_text is None


def test_self_dedup_is_idempotent(spark):
    """Cleaning a cleaned corpus removes nothing: first occurrences
    survive, so no window can repeat after the transform."""
    first = self_dedup_frame(
        _docs(
            spark,
            [(1, "a b c a b c d"), (2, "x y x y x y"), (3, "p q r s p q r")],
        )
    )
    again = self_dedup_frame(
        first.select("doc_id", F.col("cleaned_text").alias("text"))
    ).collect()
    assert all(r.removed_toks == 0 for r in again)


def test_self_dedup_is_shuffle_free(spark):
    plan = (
        all_queries()["self_dedup_clean"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    body = plan.split("Sort")[-1]  # cosmetic ORDER BY keeps its range sort
    assert "Exchange hashpartitioning" not in body, plan


def test_shard_assignment_covers_all_docs_and_is_deterministic(spark):
    docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    a = docs.select("doc_id", shard_col().alias("s"))
    counts = {r.s: r.n for r in a.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= set(range(N_SHARDS))
    assert sum(counts.values()) == 1000
    # balanced within sampling noise (expected 62.5 per shard)
    assert min(counts.values()) > 20 and max(counts.values()) < 130
    # same expression, second evaluation: identical placement
    b = docs.select("doc_id", shard_col().alias("s"))
    assert a.exceptAll(b).count() == 0


def test_shard_seed_changes_placement(spark):
    docs = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    moved = docs.select(
        (shard_col("r6") != shard_col("r7")).cast("int").alias("m")
    ).agg(F.sum("m").alias("n")).collect()[0].n
    # a seed bump reshuffles ~ (1 - 1/N) of docs
    assert moved > 350


def test_shard_manifest_totals_match_corpus(spark):
    docs_n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    man = all_queries()["shard_manifest"].fn(spark, SF_DIR)
    agg = man.agg(
        F.sum("n_docs").alias("d"), F.sum("total_tokens").alias("t")
    ).collect()[0]
    assert agg.d == docs_n
    assert agg.t > 0


def test_source_data_card_row_math(spark):
    card = {r.source: r for r in all_queries()["source_data_card"].fn(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    per_source = {
        r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert set(card) == set(per_source)
    for s, row in card.items():
        assert row.n_docs == per_source[s]
        assert 0 <= row.n_exact_dup_docs < row.n_docs
        assert 0 <= row.n_quality_fail <= row.n_docs
        assert 0.0 < row.mean_quality <= 1.0
        assert row.total_bpe_tokens >= row.total_tokens  # BPE never undercounts words


def test_perplexity_buckets_partition_the_corpus(spark):
    docs_n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    rows = all_queries()["perplexity_buckets"].fn(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == docs_n
    assert all(r.mean_logprob < 0 for r in rows)
    for r in rows:  # mean of each bucket sits inside the bucket's ln-band
        assert r.logprob_bucket <= r.mean_logprob < r.logprob_bucket + 1


def test_quality_mixture_sample_bands_and_determinism(spark):
    q = all_queries()["quality_mixture_sample"].fn
    rows = q(spark, SF_DIR).collect()
    again = q(spark, SF_DIR).collect()
    assert rows == again  # seeded hash, not an RNG
    bands = {r.band for r in rows}
    assert "head" in bands
    docs_n = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert 0 < len(rows) <= docs_n
    # every head doc is kept whole: count(head kept) == count(head overall)
    # (head keep rate is 1000/1000 by construction, so none are dropped)
    head_scores = [r.avg_logprob for r in rows if r.band == "head"]
    other = [r.avg_logprob for r in rows if r.band != "head"]
    if head_scores and other:
        assert min(head_scores) >= max(other)  # bands order by score


def test_dsir_topk_ranks_and_determinism(spark):
    q = all_queries()["sampling_dsir_topk"].fn
    rows = q(spark, SF_DIR).collect()
    again = q(spark, SF_DIR).collect()
    assert rows == again  # seeded-hash Gumbel noise, not an RNG
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    keys = [r.gumbel_key for r in rows]
    assert keys == sorted(keys, reverse=True)  # ranked by descending key
    # the sample is exactly the K largest keys among ALL scored docs
    scored = all_queries()["sampling_dsir_importance"].fn(spark, SF_DIR)
    assert len(rows) == min(100, scored.count())


def test_rebalance_plan_conserves_token_budget(spark):
    rows = all_queries()["mixture_rebalance_plan"].fn(spark, SF_DIR).collect()
    assert rows
    assert abs(sum(r.target_share for r in rows) - 1.0) <= 1e-9
    total = sum(r.n_tokens for r in rows)
    assert abs(sum(r.target_tokens for r in rows) - total) <= 1e-6 * total
    # temperature 0.5 flattens: every under-represented source is upsampled
    mean_share = 1.0 / len(rows)
    for r in rows:
        if r.current_share < mean_share:
            assert r.rate > 1.0 and r.mode == "upsample", r


def test_weighted_sample_quotas_and_determinism(spark):
    from near_public_lakehouse_spark.queries.sampling import WES_K

    q = all_queries()["weighted_sample_quality"].fn
    rows = q(spark, SF_DIR).collect()
    again = q(spark, SF_DIR).collect()
    assert rows == again  # seeded hash, not an RNG
    per_source = {}
    for r in rows:
        per_source.setdefault(r.source, []).append(r)
        assert r.weight > 0 and r.es_key < 0  # ln(u)/w with u in (0,1)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    counts = {r.source: r.n for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    for s, drawn in per_source.items():
        assert len(drawn) == min(WES_K, counts[s]), s  # exact quota
        assert [r.rnk for r in sorted(drawn, key=lambda x: x.rnk)] == list(
            range(1, len(drawn) + 1)
        )


def test_sequence_packing_invariants(spark):
    """Concat-and-chunk packing: token-conserving, gap-free, every
    sequence except possibly the last exactly full, and no
    single-partition global window in the plan."""
    from tests.conftest import SF_DIR

    from near_public_lakehouse_spark.queries import all_queries
    from near_public_lakehouse_spark.queries.curation import PACK_SEQ_LEN

    reg = all_queries()
    stats = reg["training_packing_stats"].fn(spark, SF_DIR).collect()
    assert stats, "no sequences packed"
    seq_ids = [r.seq_id for r in stats]
    assert seq_ids == list(range(len(seq_ids)))  # gap-free chunk ids
    for r in stats[:-1]:
        assert r.n_tokens == PACK_SEQ_LEN and r.is_full
    assert 0 < stats[-1].n_tokens <= PACK_SEQ_LEN

    packed = reg["training_sequence_packing"].fn(spark, SF_DIR)
    total_packed = packed.groupBy().sum("n_tokens").collect()[0][0]
    from near_public_lakehouse_spark.queries.text import tokens_col
    from near_public_lakehouse_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    total_tokens = docs.select(
        F.sum(F.size(tokens_col()).cast("bigint"))
    ).collect()[0][0]
    assert total_packed == total_tokens  # nothing lost, nothing padded

    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
