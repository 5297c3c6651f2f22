"""Eval-set contamination screening over word-k-gram overlap."""

from pyspark.sql import functions as F


def _dfs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota"),  # superset of e1
            (3, "totally different words with no benchmark overlap here"),
            (4, "delta epsilon zeta eta theta unrelated tail words"),   # partial overlap
            (10, "alpha beta gamma delta epsilon zeta eta theta"),      # id collides with eval
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta")],
        "eval_id long, text string",
    )
    return corpus, eval_df


def test_contamination_scores(spark):
    from open_data_linter_spark.dedup.contamination import ngram_contamination

    corpus, eval_df = _dfs(spark)
    got = {
        (r.doc_id, r.eval_id): (r.n_shared, r.eval_coverage)
        for r in ngram_contamination(corpus, eval_df, k=5).collect()
    }
    # eval doc has 4 distinct 5-grams; doc 1 contains all 4
    assert got[(1, 10)] == (4, 1.0)
    assert got[(2, 10)] == (4, 1.0)
    assert got[(4, 10)][0] == 1  # only the "delta...theta" 5-gram
    assert (3, 10) not in got
    assert (10, 10) not in got  # self-id excluded


def test_contamination_plan_broadcasts_eval(spark):
    from open_data_linter_spark.dedup.contamination import ngram_contamination

    corpus, eval_df = _dfs(spark)
    plan = (
        ngram_contamination(corpus, eval_df, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_decontaminate_drops_covered_docs(spark):
    from open_data_linter_spark.dedup.contamination import decontaminate

    corpus, eval_df = _dfs(spark)
    kept = sorted(
        r.doc_id for r in decontaminate(corpus, eval_df, k=5,
                                        min_coverage=0.9).collect()
    )
    # docs 1 and 2 fully cover the eval doc; 4 is below 0.9; 10 is the
    # self-id exclusion (screening a corpus containing the eval rows)
    assert kept == [3, 4, 10]

    kept_loose = sorted(
        r.doc_id for r in decontaminate(corpus, eval_df, k=5,
                                        min_coverage=0.1).collect()
    )
    assert kept_loose == [3, 10]
