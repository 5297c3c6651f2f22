from open_data_linter_spark.similarity.knn import brute_force_topk, lsh_topk  # noqa: F401
