"""Generate a scaled MEASUREMENT replica of a testdata sf directory.

The driver's round-end measurement runs at a driver-generated scale
factor (sf1.0 in BENCH_r05.json) that is not shipped in /root/testdata,
so optimization work needs a local stand-in at that scale.  This script
builds one from sf0.1 — it is a *performance* replica, NOT the driver's
data: key spaces are replicated in dense blocks (rep r shifts each
table's dense 0..N-1 keys by r*N, so every modulus-based planting keeps
its density and all FK joins stay valid), dimension tables
(region/nation) are kept as-is, and documents are REGENERATED per rep by
resampling the empirical (length, lang, source, null) row distribution
with iid draws from the empirical unigram distribution — a naive 10x
copy would give every doc 9 exact clones and grossly understate the
distinct-set work the dedup family does at real sf1.0.

Usage:
    python scripts/gen_sf_replica.py /root/testdata/sf0.1 /dev/shm/sf1.0 10

Oracle correctness is never checked at this scale (the driver checks
sf0.01/sf0.001); this exists so before/after timings are taken at the
scale the driver times.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

SHIFT_COLS = {
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "customer": {"c_custkey": "customer"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "users"},
}
COPY_TABLES = ("region", "nation")


def main() -> None:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    sizes = {}
    for t in list(SHIFT_COLS) + list(COPY_TABLES) + ["documents"]:
        sizes[t] = con.execute(
            f"SELECT count(*) FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
    # user_id is a dimension inside events (dense 0..1499 at sf0.1)
    sizes["users"] = (
        con.execute(
            f"SELECT max(user_id) + 1 FROM read_parquet('{src}/events.parquet')"
        ).fetchone()[0]
        or 0
    )

    for t in COPY_TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied {sizes[t]} rows")

    for t, shifts in SHIFT_COLS.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + r.rep * {sizes[shifts[c]]} AS {c}" if c in shifts else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'), "
            f"(SELECT unnest(range({factor})) AS rep) r ORDER BY r.rep) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: {sizes[t]} -> {sizes[t] * factor} rows")

    # ---- embeddings: clone with small deterministic per-rep noise ----
    # (exact-duplicate vectors would degenerate the ANN index geometry —
    # ties everywhere, k-means cells with stacked points — and distort
    # knn probe timings; the driver's sf1.0 vectors are all distinct)
    emb = con.execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{src}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    n_emb = len(emb)
    erows = []
    for rep in range(factor):
        rng = np.random.default_rng(771_000 + rep)
        for vid, vec, label in emb:
            v = np.asarray(vec, dtype=np.float32)
            if rep > 0:
                v = v + rng.normal(0.0, 0.01, size=v.shape).astype(np.float32)
            erows.append((rep * n_emb + vid, v.tolist(), label))
    import pyarrow as pa
    import pyarrow.parquet as pq

    etbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in erows], pa.int64()),
            "embedding": pa.array([r[1] for r in erows], pa.list_(pa.float32())),
            "label": pa.array([r[2] for r in erows], pa.int32()),
        }
    )
    pq.write_table(etbl, f"{out}/embeddings.parquet")
    print(f"embeddings: {n_emb} -> {len(erows)} rows (perturbed clones)")

    # ---- documents: resample, don't clone ----
    rows = con.execute(
        f"SELECT text, lang, source FROM read_parquet('{src}/documents.parquet') "
        "ORDER BY doc_id"
    ).fetchall()
    tok_lists = [r[0].split(" ") if r[0] is not None else None for r in rows]
    counts: dict[str, int] = {}
    for tl in tok_lists:
        for tok in tl or ():
            counts[tok] = counts.get(tok, 0) + 1
    vocab = np.array(sorted(counts))
    probs = np.array([counts[v] for v in vocab], dtype=np.float64)
    probs /= probs.sum()

    n = len(rows)
    out_rows = []
    for rep in range(factor):
        if rep == 0:
            texts = [r[0] for r in rows]
            meta = rows
        else:
            rng = np.random.default_rng(988_000 + rep)
            idx = rng.integers(0, n, size=n)
            meta = [rows[j] for j in idx]
            texts = []
            for j in idx:
                tl = tok_lists[j]
                if tl is None:
                    texts.append(None)
                else:
                    texts.append(" ".join(rng.choice(vocab, size=len(tl), p=probs)))
        out_rows += [
            (rep * n + i, texts[i], meta[i][1], meta[i][2],
             len(texts[i]) if texts[i] is not None else None)
            for i in range(n)
        ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in out_rows], pa.int64()),
            "text": pa.array([r[1] for r in out_rows], pa.string()),
            "lang": pa.array([r[2] for r in out_rows], pa.string()),
            "source": pa.array([r[3] for r in out_rows], pa.string()),
            "n_chars": pa.array([r[4] for r in out_rows], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")
    print(f"documents: {n} -> {len(out_rows)} rows (resampled)")


if __name__ == "__main__":
    main()
