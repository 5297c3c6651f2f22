"""All-pairs similarity search (APSS) with prefix filtering — exact Jaccard.

The inverted-index join in ``dedup/jaccard.py`` indexes EVERY token, so its
join size is bounded only by the hot-token cap (which makes it lossy).
Prefix filtering (Chaudhuri/Ganti/Kaushik SSJoin'06; Bayardo/Ma/Srikant
WWW'07) keeps exactness while shrinking the index: order all tokens by a
global rarity rank (ascending document frequency, token as tie-break) and
index only each document's first ``|d| - ceil(t*|d|) + 1`` tokens. Any pair
with Jaccard >= t must share at least one token inside BOTH prefixes:

  J(A,B) >= t  =>  |A∩B| >= ceil(t*(|A|+|B|)/(1+t)) >= ceil(t*max(|A|,|B|))
  (the last step needs min >= t*max, which every pair meeting the threshold
  satisfies), and an overlap of a forces the (|d|-a+1)-prefixes to intersect.

So the candidate join touches only the RAREST tokens of each document — the
index is naturally skew-resistant (the near-universal tokens that create hot
keys in the full inverted index never enter a low-threshold prefix), and no
df cap / bucket cap is needed for correctness. Candidates then pass a length
filter (min >= t*max) and exact hashed-set verification.

Output is byte-identical to exact all-pairs Jaccard over the distinct
whitespace token sets — the driver oracle recomputes it as a full DuckDB
all-pairs twin (no pin).

Scale: the expensive stages are (1) the token-df aggregation (one shuffle,
map-side partials), (2) the per-doc rarity sort (one shuffle on id), (3) the
prefix self-join (shuffle on rare tokens only — for t=0.8 the prefix is
~20% of each doc), (4) verification joins on the candidate ids (tiny).
The reference (volare-all/open-data-linter) has no similarity ops at all;
this extends the engine per the training-data-pipeline mandate, sharing the
tokenization contract with ``functions/text.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_data_linter_spark.dedup._cache import persist_scoped, spread_and_pin
from open_data_linter_spark.functions.text import ws_tokens


def apss_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard pairs (id_a < id_b, jaccard >= threshold) over distinct
    lowercased whitespace tokens, via prefix-filtered candidate generation.

    ``threshold`` must be in (0, 1]; lower thresholds lengthen the prefix
    (t -> 0 degenerates to the full inverted index), so this shape is most
    effective at t >= ~0.4.

    Input contract: ``id_col`` is unique (same as dedup/minhash.py) —
    duplicate id rows would merge their token sets in the per-doc groupBy.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    src = spread_and_pin(
        "apss.src",
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")),
    )
    toks = src.select(
        "id", F.array_distinct(ws_tokens(F.col("__t"))).alias("toks")
    ).where(F.size("toks") > 0)
    exploded = toks.select("id", F.explode("toks").alias("tok"))
    # Global rarity order: ascending document frequency, token string as the
    # deterministic tie-break. No materialized rank column (a global
    # row_number would serialize on one partition) — the (tdf, tok) struct
    # IS the sort key.
    dfc = exploded.groupBy("tok").agg(F.count(F.lit(1)).alias("tdf"))
    # explicit fixed-count width under the sort-fold: the (id, tdf, tok)
    # rows are tiny, so AQE byte-coalescing would run the per-doc
    # array_sort(collect_list) on ONE task (the dedup/embedding.py trap);
    # collect_list partials reduce nothing, so the pinned repartition
    # shuffles the same bytes the groupBy would have
    par = df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        exploded.join(dfc, "tok")
        .repartition(par, "id")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("tdf", "tok"))).alias("st"))
    )
    n = F.size("st")
    # prefix length |d| - ceil(t*|d|) + 1 (>= 1 for t <= 1)
    prefix_len = (n - F.ceil(F.lit(float(threshold)) * n) + 1).cast("int")
    pref = ordered.select(
        "id",
        n.alias("n_toks"),
        # hashed token set for verification — only array<long> is persisted
        # and shuffled past this point (same rationale as minhash.py)
        F.transform(F.col("st"), lambda x: F.xxhash64(x["tok"])).alias("hs"),
        F.slice(
            F.transform(F.col("st"), lambda x: x["tok"]), F.lit(1), prefix_len
        ).alias("prefix"),
    )
    pref = persist_scoped("apss.pref", pref)  # index + both verify sides
    index = pref.select("id", "n_toks", F.explode("prefix").alias("tok"))
    l, r = index.alias("l"), index.alias("r")
    cand = (
        l.join(
            r,
            on=[F.col("l.tok") == F.col("r.tok"), F.col("l.id") < F.col("r.id")],
        )
        # length filter: J >= t forces min(|A|,|B|) >= t * max(|A|,|B|)
        .where(
            F.least(F.col("l.n_toks"), F.col("r.n_toks"))
            >= F.lit(float(threshold))
            * F.greatest(F.col("l.n_toks"), F.col("r.n_toks"))
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hs_a = pref.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"))
    hs_b = pref.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
    union = F.size(F.array_union("hs_a", "hs_b")).cast("double")
    return (
        cand.join(hs_a, "id_a")
        # pin the verify stage's width: candidate rows are tiny but the
        # per-pair array_intersect/union over full hashed token sets is
        # the expensive part — AQE would coalesce it to one task
        .repartition(par, "id_b")
        .join(hs_b, "id_b")
        # filter on the UNROUNDED ratio: the candidate stages guarantee
        # retention only for true-J >= t, so a rounded filter would admit
        # pairs in [t - 5e-7, t) that prefix/length pruning may have
        # dropped — the oracle twin filters unrounded too
        .where(inter / union >= F.lit(float(threshold)))
        .select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )
