"""CurationPipeline façade semantics: stage order, composition equivalence,
and single-plan laziness (SURVEY.md §5's API-surface tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatawork_spark.io import load
from bigdatawork_spark.pipeline_api import CurationPipeline


def test_describe_preserves_order():
    pipe = (
        CurationPipeline()
        .lang_filter("en")
        .quality_gate()
        .dedup_exact()
        .hash_sample("7f")
    )
    names = pipe.describe()
    assert names == [
        "lang_filter(en)",
        "quality_gate(5,1000)",
        "dedup_exact(text)",
        "hash_sample(<=7f)",
    ]


def test_apply_equals_manual_chain(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    piped = (
        CurationPipeline().lang_filter("en").hash_sample("3f").apply(docs)
    )
    manual = docs.filter(F.col("lang") == "en").filter(
        F.substring(F.md5("text"), 1, 2) <= "3f"
    )
    assert piped.count() == manual.count()
    assert sorted(r.doc_id for r in piped.select("doc_id").collect()) == sorted(
        r.doc_id for r in manual.select("doc_id").collect()
    )


def test_custom_stage_and_laziness(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    pipe = CurationPipeline().stage(
        "drop_short", lambda df: df.filter(F.col("n_chars") >= 50)
    )
    out = pipe.apply(docs)  # no job should have run yet (lazy)
    assert "drop_short" in pipe.describe()
    assert out.count() == docs.filter(F.col("n_chars") >= 50).count()


def test_narrow_stages_collapse_into_scan(spark, sf_dir):
    """Chained narrow stages must not introduce exchanges: the composed
    filter prefix should be one scan-side pass (dedup is the only shuffle)."""
    docs = load(spark, sf_dir, "documents")
    narrow = (
        CurationPipeline().lang_filter("en").quality_gate().hash_sample("7f")
    )
    plan = narrow.apply(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_normalize_entropy_chunk_stages(spark, sf_dir):
    """Round-4 stages: normalize is idempotent in-pipeline, entropy_gate
    drops a degenerate row, chunk fans out and matches chunk_documents'
    window math for a spot-checked doc."""
    from pyspark.sql import functions as F

    from bigdatawork_spark.io import load

    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # inject a degenerate doc the entropy gate must kill
    bad = spark.createDataFrame(
        [(99999999, "aaaaaaaaaaaaaaaaaaaa", "en", "srcX", 20)],
        docs.schema,
    )
    pipe = CurationPipeline().normalize().entropy_gate(2.0)
    out = pipe.apply(docs.unionByName(bad))
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 99999999 not in ids
    assert len(ids) > 0

    chunked = CurationPipeline().chunk(32, 24).apply(docs)
    row = chunked.filter(F.col("chunk_idx") == 0).limit(1).collect()[0]
    words = [w for w in row["text"].split(" ") if w != ""]
    assert row["chunk_text"].split(" ") == words[:32]
    n_chunks = chunked.filter(F.col("doc_id") == row["doc_id"]).count()
    assert n_chunks == len(range(0, len(words), 24))
