from open_data_linter_spark.similarity.knn import brute_force_topk, lsh_topk  # noqa: F401
from open_data_linter_spark.similarity.pq import ivf_pq_topk, pq_encode  # noqa: F401
from open_data_linter_spark.similarity.bm25 import bm25_topk  # noqa: F401
