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
            # candidate volume: distinct scored pairs before ranking
            from open_data_linter_spark.functions.vectors import bucket_signatures
            import numpy as np
            rng = np.random.default_rng(42)
            planes = rng.standard_normal((tables, bits, 64))
            planes /= np.linalg.norm(planes, axis=2, keepdims=True)
            c = e.where(F.col("embedding").isNotNull()).select(
                F.col("vec_id").alias("neighbor_id"),
                F.posexplode(bucket_signatures("embedding", planes)).alias("table", "bucket"),
            )
            qq = q.where(F.col("embedding").isNotNull()).select(
                F.col("vec_id").alias("query_id"),
                F.posexplode(bucket_signatures("embedding", planes)).alias("table", "qbucket"),
            )
            probes = F.array(
                F.col("qbucket"),
                *[F.col("qbucket").bitwiseXOR(F.lit(1 << b)) for b in range(bits)],
            )
            qq = qq.select("query_id", "table", F.explode(probes).alias("bucket"))
            cand = (
                c.join(F.broadcast(qq), on=["table", "bucket"])
                .where(F.col("neighbor_id") != F.col("query_id"))
                .select("query_id", "neighbor_id").distinct().count()
            )
            print(f"| {tables} | {bits} | {recall:.3f} | {cand} | "
                  f"{cand / (8 * n):.3f} |", flush=True)


if __name__ == "__main__":
    main()
