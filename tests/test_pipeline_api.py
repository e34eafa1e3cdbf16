"""CurationPipeline façade semantics: stage order, composition equivalence,
and single-plan laziness (SURVEY.md §5's API-surface tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatawork_spark.io import load
from bigdatawork_spark.pipeline_api import CurationPipeline
from bigdatawork_spark.registry import QUERIES


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


def test_pii_scrub_stage_redacts(spark):
    df = spark.createDataFrame(
        [(1, "mail me at bob.smith@corp.example or call 12345678")],
        "doc_id int, text string",
    )
    out = CurationPipeline().pii_scrub().apply(df).first()["text"]
    assert "[EMAIL]" in out and "[NUM]" in out
    assert "bob.smith" not in out and "12345678" not in out


def test_repetition_gate_stage(spark):
    spam = "buy now " * 30          # rep3 ratio near 1
    clean = " ".join(f"w{i}" for i in range(60))  # all distinct 3-grams
    df = spark.createDataFrame(
        [(1, spam), (2, clean)], "doc_id int, text string"
    )
    kept = [r["doc_id"] for r in
            CurationPipeline().repetition_gate(0.2).apply(df).collect()]
    assert kept == [2]


def test_split_holdout_stage_matches_operator_thresholds(spark, sf_dir):
    """The stage's split column must reproduce split_train_holdout's
    aggregate exactly (same hash thresholds, same proportions)."""
    from bigdatawork_spark.registry import QUERIES

    docs = load(spark, sf_dir, "documents")
    staged = (
        CurationPipeline().split_holdout().apply(docs)
        .groupBy("source", "split")
        .agg(F.expr("count(1) as n_docs"),
             F.expr("cast(sum(n_chars) as bigint) as n_chars"))
        .orderBy("source", "split")
    )
    want = QUERIES["split_train_holdout"](spark, sf_dir)
    assert [tuple(r) for r in staged.collect()] == [tuple(r) for r in want.collect()]


def test_mixture_temperature_stage_matches_operator(spark, sf_dir):
    """Per-source kept counts from the stage must equal mixture_resample's
    n_after column (same sqrt temperature policy, same hash threshold)."""
    from bigdatawork_spark.registry import QUERIES

    docs = load(spark, sf_dir, "documents")
    staged = (
        CurationPipeline().mixture_temperature().apply(docs)
        .groupBy("source").count().orderBy("source")
    )
    got = {r["source"]: r["count"] for r in staged.collect()}
    want = {
        r["source"]: r["n_after"]
        for r in QUERIES["mixture_resample"](spark, sf_dir).collect()
    }
    assert got == want


def test_full_stack_pipeline_composes(spark, sf_dir):
    """All ten stage types chained in the canonical order still build one
    lazy plan and produce rows; describe() reflects the order."""
    docs = load(spark, sf_dir, "documents")
    pipe = (
        CurationPipeline()
        .normalize()
        .pii_scrub()
        .lang_filter("en")
        .quality_gate()
        .entropy_gate()
        .repetition_gate()
        .dedup_exact()
        .mixture_temperature()
        .split_holdout()
        .chunk()
    )
    assert len(pipe.describe()) == 10
    out = pipe.apply(docs)
    assert out.where("split = 'train'").count() > 0
    assert "chunk_text" in out.columns


def test_perplexity_gate_stage_matches_operator(spark, sf_dir):
    """The gate keeps exactly the docs the lm_perplexity_score operator
    scores at or below the threshold (plus any unscored <2-word docs)."""
    docs = load(spark, sf_dir, "documents")
    thr = 30.2
    kept = set(
        r["doc_id"]
        for r in CurationPipeline()
        .perplexity_gate(thr)
        .apply(docs)
        .select("doc_id")
        .collect()
    )
    scored = {
        r["doc_id"]: r["ppl"]
        for r in QUERIES["lm_perplexity_score"](spark, sf_dir).collect()
    }
    want = {d for d, p in scored.items() if p <= thr} | (
        set(r["doc_id"] for r in docs.select("doc_id").collect())
        - set(scored)
    )
    assert kept == want
    assert 0 < len(kept) < docs.count()


def test_remove_repeated_spans_stage_matches_operator(spark, sf_dir):
    """The in-place span-removal stage produces exactly the operator's
    cleaned_text for every doc (case-folded by contract)."""
    docs = load(spark, sf_dir, "documents")
    out = {
        r["doc_id"]: r["text"]
        for r in CurationPipeline()
        .remove_repeated_spans()
        .apply(docs)
        .select("doc_id", "text")
        .collect()
    }
    want = {
        r["doc_id"]: r["cleaned_text"]
        for r in QUERIES["dedup_spans_removal"](spark, sf_dir).collect()
    }
    assert out == want
    assert any(v == "" for v in out.values())  # fully-repeated docs
