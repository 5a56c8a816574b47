"""Training-shard writer (`operators/shards.py`): placement parity with
shard_manifest, per-shard doc_id ordering, overwrite idempotence, and
the store audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from near_public_lakehouse_spark.operators.shards import (
    verify_shard_store,
    write_training_shards,
)
from near_public_lakehouse_spark.queries import all_queries
from near_public_lakehouse_spark.sources.tables import load_table

from tests.conftest import SF_DIR


def test_written_shards_match_computed_manifest(spark, tmp_path):
    base = str(tmp_path / "shards")
    docs = load_table(spark, SF_DIR, "documents")
    write_training_shards(docs, base)
    stored = {
        r.shard_id: (r.n_docs, r.min_doc_id, r.max_doc_id)
        for r in spark.read.parquet(f"{base}/_manifest").collect()
    }
    computed = {
        r.shard_id: (r.n_docs, r.min_doc_id, r.max_doc_id)
        for r in all_queries()["shard_manifest"].fn(spark, SF_DIR).collect()
    }
    assert stored == computed
    # and no document was lost or duplicated across shard dirs
    data = spark.read.parquet(f"{base}/data")
    assert data.count() == docs.count()
    assert data.select("doc_id").distinct().count() == docs.count()


def test_shard_files_are_doc_id_sorted(spark, tmp_path):
    base = str(tmp_path / "shards")
    write_training_shards(load_table(spark, SF_DIR, "documents"), base)
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(f"{base}/data/shard_id=*/*.parquet")
    assert files
    for f in files:
        ids = pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()
        assert ids == sorted(ids), f


def test_rewrite_is_stable_and_audit_is_clean(spark, tmp_path):
    base = str(tmp_path / "shards")
    docs = load_table(spark, SF_DIR, "documents")
    write_training_shards(docs, base)
    first = {
        (r.shard_id, r.doc_id)
        for r in spark.read.parquet(f"{base}/data").select("shard_id", "doc_id").collect()
    }
    write_training_shards(docs, base)  # overwrite with identical placement
    second = {
        (r.shard_id, r.doc_id)
        for r in spark.read.parquet(f"{base}/data").select("shard_id", "doc_id").collect()
    }
    assert first == second
    audit = verify_shard_store(spark, base)
    assert audit.filter(F.col("mismatch")).count() == 0
    assert audit.count() > 0


def test_seed_bump_reshuffles_deterministically(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").limit(200)
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_training_shards(docs, a, seed="r6")
    write_training_shards(docs, b, seed="r7")
    pa = {
        r.doc_id: r.shard_id
        for r in spark.read.parquet(f"{a}/data").select("doc_id", "shard_id").collect()
    }
    pb = {
        r.doc_id: r.shard_id
        for r in spark.read.parquet(f"{b}/data").select("doc_id", "shard_id").collect()
    }
    assert set(pa) == set(pb)
    assert any(pa[d] != pb[d] for d in pa)  # the placement actually moved


def test_streaming_shards_equal_batch_store(spark, tmp_path):
    docs_path = f"{SF_DIR}/documents.parquet"
    sbase = str(tmp_path / "s")
    bbase = str(tmp_path / "b")
    from near_public_lakehouse_spark.operators.shards import (
        shard_manifest_from_stream,
        streaming_training_shards,
    )

    streaming_training_shards(
        spark, docs_path, sbase, str(tmp_path / "ckpt")
    ).awaitTermination(120)
    write_training_shards(load_table(spark, SF_DIR, "documents"), bbase)
    got = {
        (r.shard_id, r.doc_id)
        for r in spark.read.parquet(f"{sbase}/data").select("shard_id", "doc_id").collect()
    }
    want = {
        (r.shard_id, r.doc_id)
        for r in spark.read.parquet(f"{bbase}/data").select("shard_id", "doc_id").collect()
    }
    assert got == want
    sm = {
        r.shard_id: (r.n_docs, r.min_doc_id, r.max_doc_id)
        for r in shard_manifest_from_stream(spark, sbase).collect()
    }
    bm = {
        r.shard_id: (r.n_docs, r.min_doc_id, r.max_doc_id)
        for r in spark.read.parquet(f"{bbase}/_manifest").drop("seed").collect()
    }
    assert sm == bm


def test_streaming_shards_accumulate_across_triggers(spark, tmp_path):
    from near_public_lakehouse_spark.operators.shards import (
        shard_manifest_from_stream,
        streaming_training_shards,
    )

    src = str(tmp_path / "docs")
    base = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(
        [(i, f"doc {i}", "en", "s", 6) for i in range(50)], schema
    ).write.parquet(src)
    streaming_training_shards(spark, src, base, ckpt).awaitTermination(60)
    first = spark.read.parquet(f"{base}/data").count()
    assert first == 50

    spark.createDataFrame(
        [(100 + i, f"doc {100+i}", "en", "s", 8) for i in range(30)], schema
    ).write.mode("append").parquet(src)
    streaming_training_shards(spark, src, base, ckpt).awaitTermination(60)
    data = spark.read.parquet(f"{base}/data")
    assert data.count() == 80
    assert data.select("doc_id").distinct().count() == 80
    m = shard_manifest_from_stream(spark, base)
    total = m.agg(F.sum("n_docs").alias("n")).collect()[0].n
    assert total == 80
