"""End-to-end corpus-build pipeline: clean -> dedup -> decontam -> sample,
with planted low-quality docs, a near-dup cluster, and an eval leak."""

from __future__ import annotations

from lswms_forage_etl_spark.plans import corpus_pipeline

GOOD = ("the quick brown fox jumps over the lazy dog and then runs along "
        "the river bank toward the old mill where the miller waits")


def _docs(spark):
    rows = [
        (1, GOOD, "srcA"),
        (2, GOOD + " every single evening", "srcA"),          # near-dup of 1
        (3, "x" * 20, "srcA"),                                 # low quality
        (4, "completely different words about spark engines and their "
            "shuffle behavior when joins repartition the fact tables",
         "srcB"),
        (5, "this training document quotes the held out benchmark answer "
            "which is forty two exactly as the evaluation expects it "
            "to appear in context", "srcB"),                   # leaks eval
        (6, "an innocuous paragraph describing weather patterns over the "
            "highlands with rain expected in the afternoon hours", "srcB"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _eval(spark):
    return spark.createDataFrame(
        [(100, "quotes the held out benchmark answer which is forty two "
               "exactly as the evaluation expects")],
        "doc_id long, text string")


def test_corpus_pipeline_end_to_end(spark):
    pipe = corpus_pipeline(quality_min=0.8, jaccard_min=0.5,
                           containment_min=0.8, per_source_cap=10)
    ctx = pipe.run(spark, {"docs": _docs(spark), "eval_docs": _eval(spark)})
    assert [r.status for r in pipe.results] == ["ok"] * 4

    clean_ids = {r["doc_id"] for r in ctx["clean"].select("doc_id").collect()}
    assert 3 not in clean_ids                       # quality gate

    dedup_ids = {r["doc_id"] for r in
                 ctx["deduped"].select("doc_id").collect()}
    assert 1 in dedup_ids and 2 not in dedup_ids    # cluster keeps min id

    corpus_ids = {r["doc_id"] for r in
                  ctx["corpus"].select("doc_id").collect()}
    assert 5 not in corpus_ids                      # eval leak removed
    assert {1, 4, 6} <= corpus_ids


def test_corpus_pipeline_empty_guard_cascade(spark):
    pipe = corpus_pipeline()
    empty = _docs(spark).where("doc_id < 0")
    ctx = pipe.run(spark, {"docs": empty, "eval_docs": _eval(spark)})
    assert [r.status for r in pipe.results] == ["skipped"] * 4
    assert "corpus" not in ctx
