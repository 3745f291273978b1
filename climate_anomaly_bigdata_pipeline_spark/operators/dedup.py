"""Near-duplicate detection for training-data pipelines (SURVEY §2.10).

Four standard recipes, all engine-portable (md5-derived hashes, never
Spark's Murmur3 ``hash`` — SURVEY §2.7 portability note):

* :func:`jaccard_pairs` — exact word-n-gram Jaccard similarity join.
* :func:`minhash_signatures` + :func:`lsh_candidates` — MinHash + LSH
  banding: the scale path. k md5-derived hash functions per shingle,
  per-document min, band signatures, bucket self-join.
* :func:`simhash` — 16-bit SimHash per document (sign-aggregated token
  hash bits); equal values are near-dup candidates.
* :func:`embedding_neardup_pairs` — cosine-threshold self-join over an
  embedding column (brute force; LSH-bucketed variant in similarity.py).

Scale notes: the exact Jaccard join explodes on shingles — its self-join
is quadratic in documents-per-shingle, so at 100 TB drop "stop
shingles" (appearing in more than ``max_doc_freq`` docs) first; that's
both a correctness improvement (boilerplate shingles carry no signal)
and the only way the join stays bounded. MinHash-LSH replaces the
quadratic join with a per-band bucket join — candidates only — which is
the recipe that actually scales; tune (k, bands) for the target
similarity threshold via the standard S-curve.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from climate_anomaly_bigdata_pipeline_spark.operators.text import tokens_expr


def md5_hash32(col: Column, seed: int) -> Column:
    """Portable 32-bit hash: first 8 hex digits of md5(seed:value).
    Identical in any engine with md5 + hex parsing (DuckDB:
    ``CAST(concat('0x', substr(md5(...), 1, 8)) AS BIGINT)``)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 8), 16, 10
    ).cast("long")


def shingles_expr(text_col: str | Column = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (empty array when
    the document has fewer than n tokens)."""
    toks = tokens_expr(text_col)
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def exploded_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Explode documents into (id, shingle) rows.

    The input is repartitioned first: a document table often arrives as
    few large-row partitions (one small parquet file here; at 100 TB,
    fat skewed splits), and the ~tokens× explosion inherits that
    partitioning — leaving most cores idle for the most expensive step.
    Spreading rows before the explode costs one narrow-ish shuffle of
    the small pre-explosion data and parallelizes everything after.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(parallelism, id_col).select(
        F.col(id_col), F.explode(shingles_expr(text_col, n)).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join: pairs (id1 < id2) with
    |S1∩S2| / |S1∪S2| >= threshold.

    ``max_doc_freq`` drops shingles shared by more than that many
    documents before the pair join — the stop-shingle guard that keeps
    the join from going quadratic on boilerplate at scale.
    """
    from pyspark.sql import Window

    sh = exploded_shingles(df, id_col, text_col, n)
    if max_doc_freq is not None:
        w_df = Window.partitionBy("shingle")
        sh = sh.withColumn("__df", F.count(F.lit(1)).over(w_df)).filter(
            F.col("__df") <= max_doc_freq
        ).drop("__df")
    # Carry each document's shingle count on the exploded rows via a
    # window (one shuffle by doc) instead of a separate sizes branch +
    # two post-join lookups: the shingle lineage is evaluated once per
    # join side rather than four times, and two joins disappear.
    w_doc = Window.partitionBy(id_col)
    shn = sh.withColumn("n", F.count(F.lit(1)).over(w_doc))
    a = shn.select(F.col(id_col).alias("id1"), "shingle", F.col("n").alias("n1"))
    b = shn.select(F.col(id_col).alias("id2"), "shingle", F.col("n").alias("n2"))
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
        )
    )
    jac = F.col("shared").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("shared")
    ).cast("double")
    return (
        shared.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "shared", "n1", "n2", "jaccard")
    )


#: Prime just above 2^32 for the affine MinHash permutation family.
MINHASH_PRIME = 4_294_967_311


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) affine coefficients derived driver-side via
    hashlib md5 — reproducible in any engine as plain literals.
    a < 2^30 keeps a*h < 2^62: no BIGINT overflow in either engine."""
    import hashlib

    params = []
    for i in range(k):
        ha = hashlib.md5(f"{seed}:a:{i}".encode()).hexdigest()
        hb = hashlib.md5(f"{seed}:b:{i}".encode()).hexdigest()
        a = (int(ha[:8], 16) % ((1 << 30) - 1)) + 1
        b = int(hb[:8], 16)
        params.append((a, b))
    return params


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    n: int = 3,
) -> DataFrame:
    """k-permutation MinHash signature per document.

    One md5 per shingle (the expensive part), then k cheap affine
    permutations ``(a_i·h + b_i) mod P`` — the classic universal-hash
    family — instead of k md5 evaluations (~k× less hashing in the hot
    path). One explode + one grouped aggregation: the k min-aggs share
    a single shuffle and combine map-side.
    """
    sh = exploded_shingles(df, id_col, text_col, n)
    h0 = md5_hash32(F.col("shingle"), 0)
    aggs = [
        F.min((F.lit(a) * h0 + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_params(k))
    ]
    return sh.groupBy(id_col).agg(*aggs)


def _lsh_stacked(
    sig: DataFrame, id_col: str, k: int, bands: int
) -> DataFrame:
    """(id, band_idx, band_val) rows: one md5 band key per signature
    slice, exploded so every band lands in the same keyed shuffle."""
    r = k // bands
    band_cols = [
        F.md5(
            F.concat_ws(",", *[F.col(f"mh_{b * r + j}") for j in range(r)])
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col), *band_cols)
    return banded.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("band_val")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    ).select(F.col(id_col), F.col("bv.band_idx"), F.col("bv.band_val"))


def lsh_bucket_overflow(
    sig: DataFrame,
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """Monitoring companion to :func:`lsh_candidates`: the buckets that
    exceed ``max_bucket_size`` (band_idx, band_val, bucket_n). Run it —
    or inspect its count — whenever candidates were generated with a
    cap, to see what the truncation dropped."""
    stacked = _lsh_stacked(sig, id_col, k, bands)
    return (
        stacked.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket_size)
    )


def lsh_candidates(
    sig: DataFrame,
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
    max_bucket_size: int = 1024,
) -> DataFrame:
    """LSH banding over MinHash signatures: documents sharing any band
    (r = k/bands consecutive signature values) are candidate pairs.

    The band value is md5 of the comma-joined row — a string key that
    buckets identically in any engine. Output: distinct (id1 < id2).

    Pairs are generated by grouping ids per (band, value) bucket and
    expanding combinations in-row, not by self-joining the banded
    table: a self-join would recompute the (expensive) signature
    lineage once per branch and add a shuffle join; the groupBy shape
    computes signatures once and shuffles once.

    ``max_bucket_size`` bounds the per-bucket membership BEFORE the
    ``collect_list`` (row_number over the same keys — the window and
    the groupBy share one exchange), so a degenerate corpus (thousands
    of identical documents hashing into one bucket) cannot OOM a task
    or go quadratic in-row: each truncated bucket contributes at most
    C(cap, 2) pairs from its ``cap`` smallest ids. Members of such a
    bucket are mutual near-dups of the retained ids anyway — a
    giant bucket means exact-dup-level redundancy that the exact-hash
    dedup pass should have removed first. Use
    :func:`lsh_bucket_overflow` to surface truncated buckets.
    """
    from pyspark.sql import Window

    stacked = _lsh_stacked(sig, id_col, k, bands)
    w = Window.partitionBy("band_idx", "band_val").orderBy(id_col)
    buckets = (
        stacked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_bucket_size)
        .groupBy("band_idx", "band_val")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
    )
    ids = F.col("ids")
    pairs = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("id1"), y.alias("id2")),
            ),
        )
    )
    return (
        buckets.filter(F.size(ids) > 1)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.id1").alias("id1"), F.col("p.id2").alias("id2"))
        .distinct()
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_dist: int = 2,
) -> DataFrame:
    """Blocked entity-resolution join: pairs (id1 < id2) within the
    same block whose ``text_col`` values are within ``max_dist``
    Levenshtein edits.

    Blocking is what makes fuzzy matching survive scale: the self-join
    key is the block, so candidate pairs are Σ|block|² instead of N² —
    choose blocks (prefix, phonetic key, attribute tuple) so the
    biggest block stays task-sized, exactly like the LSH band buckets.
    ``levenshtein`` is a JVM builtin (no UDF); its cost is
    O(len²) per pair, so never run it unblocked.
    """
    a = df.select(
        *block_cols,
        F.col(id_col).alias("id1"),
        F.col(text_col).alias("s1"),
    )
    b = df.select(
        *block_cols,
        F.col(id_col).alias("id2"),
        F.col(text_col).alias("s2"),
    )
    return (
        a.join(b, list(block_cols))
        .filter(F.col("id1") < F.col("id2"))
        # Thresholded levenshtein: the 3-arg form abandons the DP as
        # soon as the running minimum exceeds max_dist (returns -1),
        # and returns the EXACT distance otherwise — one early-exit DP
        # per pair replaces the full O(len²) one (measured 1.5x on
        # 18-char names; grows with string length). A length-gap
        # prefilter was also tried and measured a net LOSS (extra
        # filter stage cost > DP saved on short strings).
        .withColumn("dist", F.levenshtein("s1", "s2", max_dist))
        .filter(F.col("dist") >= 0)
        .select(*block_cols, "id1", "id2", "s1", "s2", "dist")
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every character ``k``-gram
    of the whitespace-normalized text, slide a window of ``w``
    consecutive gram hashes over each document, and keep the minimum of
    each window. The distinct selected hashes are the document's
    fingerprint set — winnowing guarantees any shared substring of
    length ≥ k+w-1 contributes at least one common fingerprint, which
    is the local-similarity guarantee plain MinHash lacks.

    Shape: one narrow repartition by document, one explode (~chars per
    doc), one window-min sharing that partitioning, one grouped
    aggregation — no joins, no quadratic step; document order never
    matters, so this parallelizes to any corpus size. Gram hashes are
    the portable md5 recipe (seed 1), reproducible in any engine.

    Output per document: ``n_fp`` distinct fingerprints and their
    min/max/sum (a compact, engine-portable digest of the set).
    Documents shorter than k+w-1 normalized chars (no full window)
    are dropped — too short to fingerprint at this granularity.
    """
    from pyspark.sql import Window

    parallelism = df.sparkSession.sparkContext.defaultParallelism
    sized = (
        df.repartition(parallelism, id_col)
        .withColumn("__norm", F.array_join(tokens_expr(text_col), " "))
        .withColumn("__n", F.length("__norm") - k + 1)
        .filter(F.col("__n") >= w)
    )
    grams = sized.select(
        F.col(id_col),
        F.col("__n").alias("n_grams"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("__n")),
                lambda i: F.col("__norm").substr(i, F.lit(k)),
            )
        ).alias("pos", "gram"),
    )
    w_win = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(Window.currentRow, w - 1)
    )
    fps = (
        grams.withColumn("fp", F.min(md5_hash32(F.col("gram"), 1)).over(w_win))
        .filter(F.col("pos") <= F.col("n_grams") - w)
        .select(F.col(id_col), "fp")
        .distinct()
    )
    return fps.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.min("fp").alias("fp_min"),
        F.max("fp").alias("fp_max"),
        F.sum("fp").alias("fp_sum"),
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
) -> DataFrame:
    """SimHash per document: for each bit position j, sum ±1 over the
    document's tokens according to bit j of the token's 32-bit md5
    hash; bit j of the result is set when the sum is positive.

    Token multiplicity is kept (standard SimHash term weighting).
    Near-duplicates land on equal (or small-Hamming-distance) values.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    toks = df.repartition(parallelism, id_col).select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok")
    )
    th = md5_hash32(F.col("tok"), 0)
    sums = toks.groupBy(id_col).agg(
        *[
            F.sum(
                (F.shiftright(th, j).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"s_{j}")
            for j in range(bits)
        ]
    )
    sim = None
    for j in range(bits):
        term = F.when(F.col(f"s_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return sums.select(F.col(id_col), sim.alias("simhash"))


def connected_components(
    pairs: DataFrame,
    src_col: str = "id1",
    dst_col: str = "id2",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over a candidate-pair graph — the step that
    turns near-dup PAIRS into dedup CLUSTERS (keep one doc per
    component). Iterative min-label propagation: every node repeatedly
    adopts the smallest label among itself and its neighbors until a
    fixpoint; output is (node, cluster_id = component minimum).

    Convergence takes O(graph diameter) rounds — near-dup components
    are near-cliques, so 2-4 in practice; ``max_iter`` bounds
    pathological chains. Each round is one shuffle join + one grouped
    min (label table is 2 columns — node payloads never loop).
    The per-round convergence check is a bounded count action, and the
    label lineage is truncated with ``localCheckpoint`` so the plan
    doesn't grow by one join per round (the classic iterative-Spark
    trap); at 100 TB swap in reliable ``checkpoint``. For graphs whose
    DIAMETER is large (chains, meshes — not the near-clique dedup
    case), use :func:`connected_components_star`, which converges in
    O(log^2 n) rounds regardless of diameter.
    """
    edges = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    edges = edges.localCheckpoint()

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("cluster_id", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("src"), F.col("cluster_id").alias("src_label")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("src_label").alias("nbr_label"))
        )
        # Fold the convergence flag into the same projection that
        # computes the new label: the old label is already on the row,
        # so no second join is needed to detect change — one join +
        # one bounded count per round instead of two joins + a count.
        new_label = F.least(
            F.col("cluster_id"),
            F.coalesce(F.col("nbr_label"), F.col("cluster_id")),
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                new_label.alias("cluster_id"),
                (new_label < F.col("cluster_id")).alias("__changed"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("cluster_id"))


def connected_components_star(
    pairs: DataFrame,
    src_col: str = "id1",
    dst_col: str = "id2",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — same contract as :func:`connected_components`
    ((node, cluster_id = component min) for every node appearing in
    ``pairs``), but convergence is O(log^2 n) ROUNDS INDEPENDENT OF
    GRAPH DIAMETER, where plain min-label propagation needs O(diameter)
    rounds and silently truncates a long chain at ``max_iter``.

    Per round, on the current edge set E (kept oriented large->small,
    distinct, self-loop-free):

    * **large-star**: for each node u with neighborhood G(u) (E read
      bidirectionally), let m = min(G(u) + {u}); emit (v, m) for every
      neighbor v > u. Strictly-larger neighbors re-attach to the local
      minimum, halving long paths.
    * **small-star**: group the (large->small) edges by head u, let
      m = min of its smaller neighbors; re-point u and all those
      neighbors at m. This flattens each local star.

    Both steps are one groupBy + one self-join (two key shuffles); no
    step materializes a neighborhood in memory, so high-degree nodes
    spill to the shuffle, not the heap. Lineage is truncated per round
    with ``localCheckpoint`` (swap for reliable ``checkpoint`` on a
    cluster). At the fixpoint E is exactly the star set
    {(v, min_of_component)}, which is read off as the label table.

    Used by the dedup pipeline when cluster shapes are unknown;
    property-tested equal to the propagation variant on random graphs
    and on a 10k-node chain where propagation's default cap truncates
    (``tests/test_round4_ops.py``).
    """
    nodes = (
        pairs.select(F.col(src_col).alias("node"))
        .union(pairs.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    edges = (
        pairs.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("u"),
            F.least(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # -- large-star ----------------------------------------------------
        bidir = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = bidir.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        large = (
            bidir.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            # emitted as (larger, smaller): v > u >= m
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # -- small-star ----------------------------------------------------
        small_mins = large.groupBy("u").agg(F.min("v").alias("m"))
        new_edges = (
            large.join(small_mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(small_mins.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # Fixpoint when the (distinct) edge sets are identical — two
        # bounded anti-join probes, each short-circuited by limit(1).
        grew = new_edges.subtract(edges).limit(1).count()
        shrank = edges.subtract(new_edges).limit(1).count() if grew == 0 else 1
        edges = new_edges
        if grew == 0 and shrank == 0:
            break

    # At the fixpoint every edge is (member, component_min); the min
    # itself and isolated nodes (self-pairs) label themselves.
    labels = edges.select(F.col("u").alias("node"), F.col("v").alias("cluster_id"))
    return (
        nodes.join(labels, "node", "left")
        .select(
            "node", F.coalesce(F.col("cluster_id"), F.col("node")).alias("cluster_id")
        )
    )


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product over array<double> — bit-identical
    to DuckDB's list_dot_product (verified empirically)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (F.sqrt(dot_expr(a, a)) * F.sqrt(dot_expr(b, b)))


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    block_dims: int = 0,
) -> DataFrame:
    """Cosine self-join: pairs (id1 < id2) with cosine >= threshold.

    ``block_dims=0`` is the brute-force correctness baseline: a cross
    join evaluating every O(n²) pair. Norms are computed once per
    vector *before* the join (linear work) so each pair evaluates a
    single dot-product fold instead of three — the folds are
    interpreted (not codegen'd), so this is a 3× cut of the dominant
    cost. cosine = dot/(norm1·norm2) is the same expression tree, so
    oracle values are unchanged.

    ``block_dims=1|2`` is a LOSSLESS grid-blocking rewrite of the same
    result set: cosine(a,b) >= t bounds the unit-normalized Euclidean
    distance by sqrt(2-2t), hence each normalized coordinate of a
    qualifying pair differs by at most that. Bucketing coordinate k
    into cells of width w = sqrt(2-2t) guarantees matching pairs sit
    in the same or adjacent cells, so an equi-join of build cells
    against probe cells exploded to {c-1, c, c+1} per blocked
    dimension covers every qualifying pair exactly once (the id1 <
    id2 filter keeps one orientation). The cross join becomes a keyed
    shuffle join whose pair count shrinks with the spread of the
    blocked coordinates (~10-50× here) — same exact output, and at
    100 TB the blocked plan is the only one that survives. Requires
    t > 0 (unit-distance bound must exist); falls back to brute force
    otherwise.
    """
    e = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("norm", F.sqrt(dot_expr(F.col("v"), F.col("v"))))
    if block_dims > 0 and threshold > 0.0:
        w = float((2.0 - 2.0 * min(threshold, 1.0)) ** 0.5) or 1e-12
        # Tiny margin so coordinate pairs landing exactly w apart can't
        # straddle two non-adjacent cells through fp rounding.
        w *= 1.0 + 1e-9
        dims = list(range(min(block_dims, 2)))
        cells = [
            F.floor(F.col("v")[d] / F.col("norm") / F.lit(w)).cast("long")
            for d in dims
        ]
        build = e.select(
            F.col("id").alias("id1"),
            F.col("v").alias("v1"),
            F.col("norm").alias("n1"),
            *[c.alias(f"cell{d}") for d, c in zip(dims, cells)],
        )
        probe = e.select(
            F.col("id").alias("id2"),
            F.col("v").alias("v2"),
            F.col("norm").alias("n2"),
            *[c.alias(f"pc{d}") for d, c in zip(dims, cells)],
        )
        for d in dims:
            probe = probe.withColumn(
                f"cell{d}",
                F.explode(
                    F.array(
                        F.col(f"pc{d}") - 1, F.col(f"pc{d}"), F.col(f"pc{d}") + 1
                    )
                ),
            )
        joined = build.join(probe, [f"cell{d}" for d in dims])
    else:
        a = e.select(
            F.col("id").alias("id1"), F.col("v").alias("v1"), F.col("norm").alias("n1")
        )
        b = e.select(
            F.col("id").alias("id2"), F.col("v").alias("v2"), F.col("norm").alias("n2")
        )
        joined = a.crossJoin(b)
    return (
        joined.filter(F.col("id1") < F.col("id2"))
        .withColumn(
            "cosine",
            dot_expr(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-decontamination join: corpus documents sharing at
    least one word n-gram with an eval/benchmark document — the
    contamination check every pretraining pipeline runs before
    training (n≈8-13 word grams are the published recipe; GPT-3
    appendix C uses 13-grams).

    The benchmark side is eval-set-sized, so its exploded shingles are
    broadcast — the corpus side streams through map-side: shingle
    (row-local explode), hash-join against the broadcast set, one
    grouped count by (corpus_id, benchmark_id). No corpus-side shuffle
    until the tiny match set aggregates.
    """
    c_sh = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.explode(shingles_expr(text_col, n)).alias("__sh"),
    )
    b_sh = benchmark.select(
        F.col(id_col).alias("benchmark_id"),
        F.explode(shingles_expr(text_col, n)).alias("__sh"),
    )
    return (
        c_sh.join(F.broadcast(b_sh), "__sh")
        .groupBy("corpus_id", "benchmark_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_ngrams"))
    )


def prefix_filtered_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n: int = 1,
) -> DataFrame:
    """Exact word-set Jaccard join via PREFIX FILTERING (SSJoin /
    AllPairs family — Chaudhuri et al. ICDE'06, Bayardo et al. WWW'07):
    the deterministic, provably-complete candidate pruner, where
    MinHash-LSH is the probabilistic one.

    Under any fixed global token order, if J(A,B) >= t then A and B
    must share a token among each one's first |S| - ceil(t*|S|) + 1
    tokens (its "prefix"): fewer than that many misses can't happen or
    the overlap bound ceil(t*|S|) is violated. So candidates = pairs
    sharing >= 1 PREFIX token only — ordering tokens rarest-first makes
    prefixes hit the rarest tokens and candidate lists tiny. Exact
    Jaccard is then verified only for candidates (join restricted via
    the candidate pair set), so the output is bit-identical to the
    quadratic join: same pairs, same scores, no false negatives.

    Shuffles: tokens by doc (sizes+prefix rank), by token (df rank +
    candidate join), candidates by pair (verify) — all keyed, no cross
    join anywhere; boilerplate tokens never enter prefixes, which is
    the property that keeps this linear-ish on skewed corpora.

    ``n`` picks the set element: 1 = distinct words, >1 = word
    n-gram shingles. Prefix filtering prunes by the RAREST elements,
    so the element universe must be discriminative for the corpus —
    on a tiny-vocabulary corpus word sets are all near-identical and
    every candidate list is the whole corpus (measured: a 140 s
    blowup at sf0.1); shingles restore per-document-unique elements
    and with them the pruning power. Same trade the n-gram Jaccard
    join documents.
    """
    from pyspark.sql import Window

    if n > 1:
        elems = shingles_expr(text_col, n)
    else:
        elems = F.array_distinct(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda x: x != "",
            )
        )
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(elems).alias("tok")
    ).distinct()
    w_doc = Window.partitionBy("id")
    w_tok = Window.partitionBy("tok")
    # rarest-first global order; (df, tok) totally orders tokens
    w_rank = Window.partitionBy("id").orderBy("df", "tok")
    ranked = (
        toks.withColumn("df", F.count(F.lit(1)).over(w_tok))
        .withColumn("sz", F.count(F.lit(1)).over(w_doc))
        .withColumn("pos", F.row_number().over(w_rank))
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1
    )
    cand = (
        prefix.select(F.col("id").alias("id1"), "tok", F.col("sz").alias("sz1"))
        .join(
            prefix.select(F.col("id").alias("id2"), "tok", F.col("sz").alias("sz2")),
            "tok",
        )
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "sz1", "sz2")
        .distinct()
    )
    # Verify candidates only: explode each candidate's left token set,
    # hash-join against the right side's tokens on (id2, tok).
    t1 = toks.select(F.col("id").alias("id1"), "tok")
    t2 = toks.select(F.col("id").alias("id2"), "tok")
    overlap = (
        cand.join(t1, "id1")
        .join(t2, ["id2", "tok"])
        .groupBy("id1", "id2", "sz1", "sz2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("sz1") + F.col("sz2") - F.col("n_common"))
    return (
        overlap.withColumn("jaccard", F.round(jac, 6))
        .filter(jac >= threshold)
        .select("id1", "id2", "n_common", "jaccard")
    )
