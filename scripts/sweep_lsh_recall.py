"""knn_lsh recall-vs-candidate-volume sweep (VERDICT r2 #6).

For the sf0.01 embeddings corpus (first 8 vectors as queries, k=5),
measures multi-table LSH recall against the exact brute-force top-5 and
the candidate volume (scored pairs before ranking) across tables × bits.

Prints a markdown table; paste into BENCH/BASELINE.md / docstrings when
parameters change.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from open_data_linter_spark.session import get_spark  # noqa: E402
from open_data_linter_spark.similarity.knn import brute_force_topk, lsh_topk  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = e.count()
    q = e.where(F.col("vec_id") < 8)
    brute = {(r.query_id, r.neighbor_id)
             for r in brute_force_topk(e, q, k=5).collect()}

    print(f"corpus n={n}, 8 queries, k=5, brute pairs={len(brute)}")
    print("| tables | bits | recall | candidate pairs | cand/query/corpus |")
    print("|---|---|---|---|---|")
    for tables in (4, 8, 12, 16):
        for bits in (6, 8):
            got = lsh_topk(e, q, k=5, bits=bits, dim=64, tables=tables)
            lsh = {(r.query_id, r.neighbor_id) for r in got.collect()}
            recall = len(brute & lsh) / len(brute)
            # candidate volume: the SAME candidate stage the shipped path
            # runs (similarity/knn.py lsh_planes + lsh_candidates), so the
            # published table can't drift from the engine
            from open_data_linter_spark.similarity.knn import (
                lsh_candidates, lsh_planes)

            planes = lsh_planes(tables, bits, 64)
            cand = lsh_candidates(e, q, planes).count()
            print(f"| {tables} | {bits} | {recall:.3f} | {cand} | "
                  f"{cand / (8 * n):.3f} |", flush=True)


if __name__ == "__main__":
    main()
