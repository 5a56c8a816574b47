"""KMV distinct sketch: merge losslessness (the property that makes it
the 100 TB shard-mergeable distinct counter) and estimator sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.queries.corpus_stats import (
    KMV_K,
    kmv_minima,
    source_token_hashes,
)
from near_public_lakehouse_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def test_kmv_sketches_merge_losslessly(spark):
    """sketch(shard A) ∪ sketch(shard B) re-cut to K minima == sketch of
    the full corpus — per source, exactly."""
    docs = load_table(spark, SF_DIR, "documents")
    full = {
        (r.source, r.hv)
        for r in kmv_minima(source_token_hashes(docs)).collect()
    }
    a = kmv_minima(source_token_hashes(docs.filter(F.col("doc_id") % 2 == 0)))
    b = kmv_minima(source_token_hashes(docs.filter(F.col("doc_id") % 2 == 1)))
    merged = {
        (r.source, r.hv) for r in kmv_minima(a.unionByName(b)).collect()
    }
    assert merged == full


def test_kmv_estimate_tracks_exact(spark):
    rows = all_queries()["kmv_distinct_sketch"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.sketch_size <= KMV_K
        if r.sketch_size < KMV_K:  # sketch holds the whole set: exact
            assert r.est_distinct == float(r.exact_distinct)
            assert r.rel_err == 0.0
        else:  # standard KMV accuracy envelope for K=16 is loose; sanity only
            assert 0 < r.est_distinct
            assert r.rel_err < 2.0


def test_cms_never_underestimates_and_merges(spark):
    """The CM guarantee (est >= exact) on every probed word, and cell
    mergeability: the sketch of a corpus equals the cellwise SUM of its
    shards' sketches."""
    from pyspark.sql import functions as F

    from near_public_lakehouse_spark.queries import all_queries
    from near_public_lakehouse_spark.sources.tables import load_table

    rows = all_queries()["sketch_cms_word_counts"].fn(spark, SF_DIR).collect()
    assert rows
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.cm_est >= r.exact_count for r in rows)
    # mergeability at the cell level, via the same md5 bucket function
    from near_public_lakehouse_spark.queries.corpus_stats import CMS_W

    docs = load_table(spark, SF_DIR, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("token")
    )
    b = (
        F.conv(F.substring(F.md5(F.concat(F.lit("cms0:"), F.col("token"))), 1, 8), 16, 10)
        .cast("bigint") % CMS_W
    )
    full = {
        r.bucket: r.cell
        for r in tok.groupBy(b.alias("bucket")).agg(F.count(F.lit(1)).alias("cell")).collect()
    }
    half = lambda pred: {
        r.bucket: r.cell
        for r in tok.filter(pred)
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell"))
        .collect()
    }
    a = half(F.col("doc_id") % 2 == 0)
    c = half(F.col("doc_id") % 2 == 1)
    merged = {k: a.get(k, 0) + c.get(k, 0) for k in set(a) | set(c)}
    assert merged == full
