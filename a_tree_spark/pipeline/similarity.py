"""Similarity search over embedding columns (array<float>).

Two paths, both with exact relational oracles:

- brute-force cosine/dot top-k: the baseline. The dot product is
  emitted as ONE explicit left-associated sum expression over the 64
  dims — identical IEEE evaluation order in Spark and DuckDB, so even
  the float values match bit-for-bit (ranks certainly do; ties break
  by neighbor id);
- LSH-bucketed ANN (the scale path): deterministic rational hyperplanes
  -> sign-bit bucket -> same-bucket candidates -> exact rerank. The
  oracle runs the same LSH logic, so the check pins the algorithm, not
  a coincidence. At 1e12 rows the bucket join replaces the quadratic
  crossJoin with one shuffle on bucket keys.

The brute-force side broadcasts the (small) query set; Catalyst turns
the crossJoin into BroadcastNestedLoopJoin — no shuffle at any scale,
O(n_queries) work per row, then a top-k window per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _splitmix64

EMBED_DIM = 64
DEFAULT_K = 5


def _dot_sql(a: str, b: str, one_based: bool) -> str:
    """Oracle-side dot product: explicit left-assoc sum. The Spark side
    uses ``_dot_spark`` (a sequential left fold over the zipped arrays),
    which performs the additions in exactly this order — so the float
    results are bit-for-bit comparable across engines."""
    offset = 1 if one_based else 0
    terms = [
        f"CAST({a}[{i + offset}] AS DOUBLE) * CAST({b}[{i + offset}] AS DOUBLE)"
        for i in range(EMBED_DIM)
    ]
    return "(" + " + ".join(terms) + ")"


def _dot_spark(a: str, b: str) -> str:
    """Spark-side dot product as a higher-order function: janino unrolls
    an explicit 64-term sum into one giant consume method — three of
    them in the near-dup join condition blew the 64KB method limit and
    the whole stage fell back to interpreted (VERDICT.md round 1).
    ``aggregate`` evaluates as a loop, so generated code stays tiny, and
    its left fold adds in the same IEEE order as the oracle's flat
    left-assoc sum."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _plane_weight(plane: int, dim: int) -> int:
    """Deterministic pseudo-random integer weights for LSH hyperplanes,
    inlined as literal constants into BOTH engines' SQL (exact).

    splitmix64 mixing matters: round 3 drew weights from a linear
    congruence, which made every plane a shifted copy of one
    quasi-periodic sequence — the planes were so correlated that 2k
    sf0.1 vectors produced only ~50-100 distinct sign patterns per band
    (buckets of 150-240, 277k candidate pairs). Mixed weights spread
    the same vectors over ~800/1024 buckets (max width 12, ~11k
    candidates) — a 26x candidate cut with no semantic change."""
    return (_splitmix64(plane * 1315423911 + dim) % 2001) - 1000


def _plane_sign_sql(emb: str, plane: int, one_based: bool) -> str:
    offset = 1 if one_based else 0
    terms = [
        f"CAST({emb}[{d + offset}] AS DOUBLE) * {_plane_weight(plane, d)}"
        for d in range(EMBED_DIM)
    ]
    return f"(CASE WHEN ({' + '.join(terms)}) >= 0 THEN 1 ELSE 0 END)"


def _plane_sign_spark(emb: str, plane: int) -> str:
    weights = ", ".join(
        f"CAST({_plane_weight(plane, d)} AS DOUBLE)" for d in range(EMBED_DIM)
    )
    dot = _dot_spark(emb, f"array({weights})")
    return f"(CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END)"


N_QUERIES = 20


def _queries(embeddings: DataFrame) -> DataFrame:
    return embeddings.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q"),
    )


def _spread(df: DataFrame, factor: int = 2, key: str | None = None) -> DataFrame:
    """Spread a SMALL relation up to ``factor x defaultParallelism``
    partitions; a no-op when the scan already has that many splits.
    The embeddings table is a few MB, so its scan yields 2-3 splits —
    but the per-row work downstream (interpreted HOF dot products,
    LSH-candidate residual verification) is orders of magnitude heavier
    than the bytes suggest, and the stage inherits the scan's
    parallelism, idling the rest of the cluster (guide §2.5: partition
    for the work you fan out to, not the bytes you hold). At real
    scale the scan has plenty of splits and this never fires; the
    partition-count probe is plan-side only (no job).

    ``key``: a unique id column to HASH-partition by instead of
    round-robin. A keyless repartition(n) first locally sorts every
    input partition (spark.sql.execution.sortBeforeRepartition, on by
    default since SPARK-23207, so retried tasks reproduce the same
    row-to-partition mapping); hashing a deterministic unique key needs
    no such sort — same retry-safety, measurably cheaper on WIDE TEXT
    rows (tfidf at sf0.1: 1.58 -> 0.87s, now cheaper than not
    spreading at all). The embedding call sites stay keyless: the
    array rows measured identical either way (1.74 vs 1.77), and the
    ivf plan pin forbids a vec_id-keyed exchange of the embedding
    relation (the round-2 antipattern it guards against)."""
    sc = df.sparkSession.sparkContext
    target = factor * sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        if key is not None:
            return df.repartition(target, F.col(key))
        return df.repartition(target)
    return df


def brute_force_topk(embeddings: DataFrame, k: int = DEFAULT_K) -> DataFrame:
    """Exact dot-product top-k per query (broadcast nested loop)."""
    queries = _queries(embeddings)
    joined = _spread(embeddings).crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.withColumn("dot", F.expr(_dot_spark("embedding", "q")))
    window = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.col("rank").cast("bigint").alias("rank"))
    )


def brute_force_oracle(k: int = DEFAULT_K, table: str = "embeddings") -> str:
    dot = _dot_sql("e.embedding", "q.embedding", True)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM {table} WHERE vec_id < {N_QUERIES})
SELECT query_id, neighbor_id, rank FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY q.query_id ORDER BY {dot} DESC, e.vec_id
           ) AS BIGINT) AS rank
    FROM {table} e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
) WHERE rank <= {k}
""".strip()


LSH_TOPK_BANDS = 4


def _table_rows(df: DataFrame) -> int:
    """Row count for plan-sizing decisions, WITHOUT a scan job when the
    optimizer already knows it: catalog/CBO statistics (ANALYZE TABLE)
    surface through the optimized plan's ``stats().rowCount()``. Plain
    un-analyzed parquet has size-only stats, so the fallback is a real
    ``count()`` — production entry points avoid even that by passing
    ``n_rows`` explicitly (the parameter every caller of
    ``lsh_topk``/``ivf_topk`` in this repo now supplies)."""
    try:
        rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
    except Exception:
        pass
    return df.count()


def lsh_planes(n_rows: int, target_bucket_width: int = 64) -> int:
    """Size-aware planes per band for the query-side ANN (VERDICT round
    3: a fixed 256-bucket table meant the exact rerank touched a
    constant FRACTION of the corpus at any n). 2^R buckets per band
    keeps the expected bucket width — hence per-query candidate volume
    and rerank cost — at ~bands * target_bucket_width regardless of
    corpus size. Clamped to [3, 32]: 8 buckets minimum keeps tiny test
    tables meaningfully bucketed; 32 sign bits still pack into the one
    BIGINT bucket key and hold expected width <= 2x target through
    n ~ 4e11 (the distinct-bucket count stays bounded by n itself)."""
    import math

    return min(
        32,
        max(3, math.ceil(math.log2(max(n_rows / target_bucket_width, 2.0)))),
    )


def lsh_topk(
    embeddings: DataFrame,
    k: int = DEFAULT_K,
    n_bands: int = LSH_TOPK_BANDS,
    planes_per_band: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """ANN: banded hyperplane-LSH bucket join + exact rerank.

    ``planes_per_band=None`` derives from the corpus row count
    (``lsh_planes``) — the production entry point always takes this
    path, so bucket granularity grows with the table. Plan shape at
    scale: ONE mapInArrow pass over the scan emits every band's bucket
    key (``band_buckets_arrow`` — bit-identical to the oracle's SQL
    signs), the broadcast query buckets join against it (no shuffle of
    the table), DISTINCT (query, vec) collapses multi-band collisions,
    and the small candidate id set broadcasts back into a second scan
    for the exact rerank — the embedding table is never shuffled.

    ``n_rows`` lets callers who know the corpus size (catalog/table
    statistics, or the driver gate's fixed fixtures) skip the plan-time
    count job (VERDICT round 4: ``embeddings.count()`` here was one
    extra full-scan Spark job per query submission — at 100 TB that's
    a scan you never wanted)."""
    if planes_per_band is None:
        planes_per_band = lsh_planes(
            n_rows if n_rows is not None else _table_rows(embeddings)
        )
    buckets_e = band_buckets_arrow(
        embeddings, "vec_id", "embedding", n_bands, planes_per_band
    )
    queries = _queries(embeddings)
    buckets_q = band_buckets_arrow(
        queries, "query_id", "q", n_bands, planes_per_band
    )
    # multi-probe (round 5): besides the exact bucket, probe every
    # 1-bit-flip neighbor — a vector within angular distance of the
    # query most often differs in at most one hyperplane sign per
    # band, so R extra probes recover most of the recall a single
    # bucket misses (measured recall@5 vs brute force: 0.52 -> 0.98
    # at sf0.01, 0.33 -> 0.81 at sf0.1; BENCH/BASELINE.md). Cost stays
    # bucket-bounded: (R+1) * expected_width candidates per band per
    # query, independent of n — and only the tiny QUERY side fans
    # out; the table's bucket stream is untouched.
    flips = [0] + [1 << j for j in range(planes_per_band)]
    probes_q = buckets_q.select(
        "query_id",
        "band",
        F.explode(
            F.array(*[F.expr(f"bucket ^ {f}") for f in flips])
        ).alias("bucket"),
    )
    cand_ids = (
        buckets_e.join(F.broadcast(probes_q), ["band", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = (
        embeddings.join(F.broadcast(cand_ids), "vec_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn("dot", F.expr(_dot_spark("embedding", "q")))
    )
    window = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(window))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.col("rank").cast("bigint").alias("rank"))
    )


def lsh_topk_oracle(
    k: int = DEFAULT_K,
    table: str = "embeddings",
    n_bands: int = LSH_TOPK_BANDS,
    planes_per_band: int | None = None,
    n_rows: int | None = None,
) -> str:
    """Oracle mirror of the banded query-side LSH; ``n_rows`` feeds the
    same ``lsh_planes`` derivation the Spark side computes at runtime
    (the driver's correctness gate runs at a known table size)."""
    if planes_per_band is None:
        if n_rows is None:
            raise ValueError("pass n_rows or planes_per_band")
        planes_per_band = lsh_planes(n_rows)
    dot = _dot_sql("e.embedding", "q.embedding", True)
    eb = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, "
        f"{_band_bucket_sql('embedding', b, planes_per_band, True)} AS bucket "
        f"FROM {table}"
        for b in range(n_bands)
    )
    qb = " UNION ALL ".join(
        f"SELECT query_id, {b} AS band, "
        f"{_band_bucket_sql('embedding', b, planes_per_band, True)} AS bucket "
        f"FROM q"
        for b in range(n_bands)
    )
    flips = ", ".join(
        f"({f})" for f in [0] + [1 << j for j in range(planes_per_band)]
    )
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM {table} WHERE vec_id < {N_QUERIES}),
eb AS ({eb}),
qb AS ({qb}),
qprobe AS (
    SELECT query_id, band, xor(bucket, flip) AS bucket
    FROM qb CROSS JOIN (VALUES {flips}) AS f(flip)
),
cand AS (
    SELECT DISTINCT qprobe.query_id, eb.vec_id
    FROM eb JOIN qprobe USING (band, bucket)
    WHERE eb.vec_id <> qprobe.query_id
)
SELECT query_id, neighbor_id, rank FROM (
    SELECT c.query_id, e.vec_id AS neighbor_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY c.query_id ORDER BY {dot} DESC, e.vec_id
           ) AS BIGINT) AS rank
    FROM cand c
    JOIN {table} e ON e.vec_id = c.vec_id
    JOIN q ON q.query_id = c.query_id
) WHERE rank <= {k}
""".strip()


# Derived fixture with PLANTED near-duplicates: the driver table is
# dup-free, so round 1's check was vacuous (0 rows == 0 rows). Every
# vec_id % 50 == 0 gains a copy scaled by 2 (power of two => exact in
# float32 in both engines; positive scale preserves hyperplane signs so
# the pair lands in the same LSH bucket; cosine is exactly 1 >= any
# threshold).
VECTORS_WITH_DUPS_SPARK = """
SELECT vec_id, embedding FROM {table}
UNION ALL
SELECT vec_id + 100000 AS vec_id,
       transform(embedding, x -> CAST(x * CAST(2.0 AS FLOAT) AS FLOAT)) AS embedding
FROM {table} WHERE vec_id % 50 = 0
""".strip()

VECTORS_WITH_DUPS_DUCKDB = """
SELECT vec_id, embedding FROM {table}
UNION ALL
SELECT vec_id + 100000 AS vec_id,
       [CAST(x * 2 AS FLOAT) for x in embedding] AS embedding
FROM {table} WHERE vec_id % 50 = 0
""".strip()


def vectors_with_dups(embeddings: DataFrame) -> DataFrame:
    embeddings.createOrReplaceTempView("_neardup_base")
    return embeddings.sparkSession.sql(
        VECTORS_WITH_DUPS_SPARK.format(table="_neardup_base")
    )


# Banded multi-table hyperplane LSH (the scale-safe near-dup shape):
# B independent hash tables, each keyed by R sign bits. Round 2 used ONE
# table of 8 planes — 256 buckets forever, so the within-bucket self-join
# was O(n^2/256) at any n (VERDICT.md). With R parameterized by corpus
# size the expected bucket width stays ~n/2^R = target_width, bounding
# the join at O(B * n * target_width); recall comes from the B bands
# (a pair colliding in ANY band is a candidate), exactly the banding
# scheme the MinHash path uses (pipeline/dedup.py).
NEARDUP_BANDS = 4
NEARDUP_PLANES_PER_BAND = 10


def neardup_planes_per_band(n_rows: int, target_bucket_width: int = 1024) -> int:
    """Size-aware plane count: 2^R buckets per band keeps the expected
    bucket width at target_bucket_width (R grows with log2(n), so the
    candidate join stays O(B * n * width) instead of O(n^2/2^R_fixed))."""
    import math

    return max(
        NEARDUP_PLANES_PER_BAND,
        math.ceil(math.log2(max(n_rows / target_bucket_width, 2.0))),
    )


def _band_bucket_matrix(X, n_bands: int, planes_per_band: int):
    """(n, n_bands) int64 bucket keys for a float64 (n, EMBED_DIM)
    matrix — the pure-numpy core of ``band_buckets_arrow``, factored
    out so the IEEE-order-equality property (numpy per-dimension
    accumulation == the SQL left fold) is directly testable against a
    pure-Python fold without a SparkSession."""
    import numpy as np

    planes_total = n_bands * planes_per_band
    W = np.array(
        [
            [_plane_weight(p, d) for d in range(EMBED_DIM)]
            for p in range(planes_total)
        ],
        dtype=np.float64,
    )
    pow2 = 1 << np.arange(planes_per_band, dtype=np.int64)
    acc = np.zeros((X.shape[0], planes_total), dtype=np.float64)
    for d in range(EMBED_DIM):
        acc += X[:, d, None] * W[None, :, d]
    bits = acc >= 0.0
    return (
        (bits.reshape(X.shape[0], n_bands, planes_per_band) * pow2).sum(axis=2)
    ).astype(np.int64)


def band_buckets_arrow(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    n_bands: int,
    planes_per_band: int,
) -> DataFrame:
    """(id, band, bucket) rows for every band, computed in ONE mapInArrow
    pass instead of n_bands * planes_per_band HOF aggregates.

    Two reasons this beats the SQL projection even though both are one
    scan: (1) each sign is a 64-term fold evaluated through Catalyst's
    interpreted HOF path — 40 planes x 64 dims per row; numpy does the
    same multiply-adds vectorized across the batch; (2) the literal
    weight arrays made a ~2,500-node expression tree whose OPTIMIZATION
    cost ~0.8s of driver time per query (measured sf0.1) — the Arrow
    plan is a dozen nodes. Bit-exactness with the DuckDB oracle: the
    SQL sign folds left-assoc in dimension order in float64
    (``_plane_sign_sql``), so accumulating ``acc += X[:, d] * W[:, d]``
    dimension-ascending in float64 performs the identical IEEE adds —
    the same order-preservation argument as ``_numpy_dist2`` (IVF)."""
    import numpy as np
    import pyarrow as pa

    bands = np.arange(n_bands, dtype=np.int32)

    def gen(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            X = (
                batch.column(1)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(n, EMBED_DIM)
            )
            buckets = _band_bucket_matrix(X, n_bands, planes_per_band)
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids, n_bands), type=pa.int64()),
                    pa.array(np.tile(bands, n), type=pa.int32()),
                    pa.array(buckets.reshape(-1), type=pa.int64()),
                ],
                names=[id_col, "band", "bucket"],
            )

    return df.select(
        F.col(id_col), F.col(emb_col).alias("_emb")
    ).mapInArrow(gen, schema=f"{id_col} long, band int, bucket long")


def _band_bucket_sql(emb: str, band: int, planes_per_band: int, one_based: bool) -> str:
    terms = [
        f"{_plane_sign_sql(emb, band * planes_per_band + p, one_based)} * {1 << p}"
        for p in range(planes_per_band)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold_x1m: int = 990000,
    n_bands: int = NEARDUP_BANDS,
    planes_per_band: int = NEARDUP_PLANES_PER_BAND,
) -> DataFrame:
    """Near-duplicate vectors by cosine >= threshold, banded-LSH-bucketed.

    Plan: ONE scan projects every band's bucket key (explode of a literal
    band array — no per-band rescan), the self equi-join on (band,
    bucket) yields id-only candidates, DISTINCT collapses multi-band
    collisions, and the exact cosine verify joins the two embeddings
    back (two keyed shuffles on vec_id — the standard verify-after-LSH
    shape, same as dedup.py's MinHash). Positive scaling preserves every
    hyperplane sign, so planted scaled duplicates collide in ALL bands —
    recall on true duplicates is 1.0 at any parameter setting.

    Cosine compare is float-exact in both engines: dot^2 >= t^2 *
    (|a|^2 |b|^2) with doubles evaluated in identical IEEE order."""
    # ROUND-8 SHAPE (same output, fewer shuffles): one WIDE row per
    # vector carrying its embedding AND all band keys, checkpointed
    # once; per band, a broadcast self-join on that band's key with
    # (a) the FIRST-MATCHING-BAND predicate replacing the old
    # .distinct() over multi-band candidate duplicates (an Exchange of
    # millions of rows at sf1.0), and (b) the exact cosine verify
    # evaluated in the join residual — both embeddings already ride
    # the joined row, removing the two candidate->embeddings join-backs
    # (each too big for auto-broadcast, so they sort-merge-shuffled the
    # candidate set twice). Guide §8: decide with small rows, and
    # never re-attach payloads through an extra shuffle.
    import numpy as np
    import pyarrow as pa

    from .dedup import _fifo_local_ckpt

    emb_type = embeddings.schema["embedding"].dataType.simpleString()

    def gen(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            X = (
                batch.column(1)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(n, EMBED_DIM)
            )
            buckets = _band_bucket_matrix(X, n_bands, planes_per_band)
            arrays = [batch.column(0), batch.column(1)]
            names = ["vec_id", "embedding"]
            for b in range(n_bands):
                arrays.append(pa.array(buckets[:, b], type=pa.int64()))
                names.append(f"b{b}")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    band_cols = ", ".join(f"b{b} long" for b in range(n_bands))
    vecs = _fifo_local_ckpt(
        _spread(embeddings.select("vec_id", "embedding")).mapInArrow(
            gen, schema=f"vec_id long, embedding {emb_type}, {band_cols}"
        )
    )

    dot = F.expr(_dot_spark("a.embedding", "b.embedding"))
    norm_a = F.expr(_dot_spark("a.embedding", "a.embedding"))
    norm_b = F.expr(_dot_spark("b.embedding", "b.embedding"))
    t = threshold_x1m / 1e6
    out = None
    for band in range(n_bands):
        j = (
            vecs.alias("a")
            .join(
                F.broadcast(vecs.alias("b")),
                F.col(f"a.b{band}") == F.col(f"b.b{band}"),
            )
            .where(F.col("a.vec_id") < F.col("b.vec_id"))
        )
        for prev in range(band):
            j = j.where(F.col(f"a.b{prev}") != F.col(f"b.b{prev}"))
        j = j.where(
            (dot > 0) & (dot * dot >= F.lit(t * t) * norm_a * norm_b)
        ).select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        out = j if out is None else out.union(j)
    return out


def embedding_near_dup_oracle(
    threshold_x1m: int = 990000,
    table: str = "embeddings",
    n_bands: int = NEARDUP_BANDS,
    planes_per_band: int = NEARDUP_PLANES_PER_BAND,
) -> str:
    dot = _dot_sql("a.embedding", "b.embedding", True)
    norm_a = _dot_sql("a.embedding", "a.embedding", True)
    norm_b = _dot_sql("b.embedding", "b.embedding", True)
    t = threshold_x1m / 1e6
    vecs = VECTORS_WITH_DUPS_DUCKDB.format(table=table)
    band_selects = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, "
        f"{_band_bucket_sql('embedding', b, planes_per_band, True)} AS bucket "
        f"FROM vecs"
        for b in range(n_bands)
    )
    return f"""
WITH vecs AS ({vecs}),
buckets AS ({band_selects}),
candidates AS (
    SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
    FROM buckets l JOIN buckets r USING (band, bucket)
    WHERE l.vec_id < r.vec_id
)
SELECT id_a, id_b
FROM candidates
JOIN vecs a ON a.vec_id = id_a
JOIN vecs b ON b.vec_id = id_b
WHERE {dot} > 0 AND {dot} * {dot} >= {t!r} * {t!r} * ({norm_a}) * ({norm_b})
""".strip()


# ------------------------------------------------------------- IVF ANN

# Coarse quantizer: a deterministic centroid subset of the vectors
# themselves (ids = OFFSET mod stride), so both engines derive the
# identical codebook with no training step. Real IVF would k-means
# these; the INDEX structure (assign -> probe -> rerank) is what
# scales. The codebook SIZE is parameterized (VERDICT round 3: a fixed
# <=16-centroid cap meant probing 2 lists reranked ~n/8 of the corpus
# forever): production derives k ~ sqrt(n) with a 64-centroid floor,
# and past the inline-literal practicality limit the assignment argmin
# runs in an Arrow kernel against a broadcast numpy codebook — same
# IEEE summation order as the SQL fold, zero shuffles on the table.
CENTROID_OFFSET = 3
IVF_INLINE_MAX = 16      # above this, inline literals give way to Arrow
IVF_MIN_CENTROIDS = 64
N_PROBE = 2


def ivf_nprobe(n_centroids: int) -> int:
    """Size-aware probe count ~ sqrt(k) (floored at the old constant):
    probing a FIXED 2 of k lists scans 2n/k vectors but its recall
    falls as k grows — measured recall@5 vs brute force was 0.31 at
    k=71 (sf0.01) and 0.17 at k=70 (sf0.1). sqrt(k) probes (8 at
    k=71) is the classic operating point: rerank volume stays
    ~sqrt(k)·n/k = n/sqrt(k) (shrinking fraction as n grows) while
    the probe set covers the query's true cluster neighborhood.
    Measured after: 0.53 / 0.38 (deterministic-subset codebook) and
    0.64 / 0.52 (trained codebook) — the residual gap is quantizer
    quality, not probe width (full table in BENCH/BASELINE.md)."""
    import math

    return max(N_PROBE, math.isqrt(max(n_centroids, 1)))


def ivf_centroids(n_rows: int) -> int:
    """k ~ sqrt(n) (classic IVF sizing: balances list width n/k against
    probe cost k), floored at 64 so even small corpora exercise the
    production Arrow-assignment path."""
    import math

    return max(IVF_MIN_CENTROIDS, math.isqrt(max(n_rows, 1)))


def ivf_centroid_params(n_rows: int, n_centroids: int) -> tuple[int, int]:
    """(stride, offset) for the deterministic codebook filter
    ``vec_id % stride = offset`` — closed-form, so the DuckDB oracle
    selects the identical centroid set."""
    stride = max(1, n_rows // n_centroids)
    return stride, min(CENTROID_OFFSET, stride - 1)


def _dist2_spark(a: str, b: str) -> str:
    """Squared L2 as a loop HOF (see _dot_spark for why not unrolled)."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        f"* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _dist2_sql(a: str, b: str) -> str:
    """Oracle-side squared L2: flat left-assoc sum (same IEEE order as
    the Spark HOF's left fold)."""
    terms = [
        f"(CAST({a}[{i + 1}] AS DOUBLE) - CAST({b}[{i + 1}] AS DOUBLE))"
        f" * (CAST({a}[{i + 1}] AS DOUBLE) - CAST({b}[{i + 1}] AS DOUBLE))"
        for i in range(EMBED_DIM)
    ]
    return "(" + " + ".join(terms) + ")"


def _centroid_filter(stride: int, offset: int, col: str = "vec_id") -> str:
    return f"{col} % {stride} = {offset}"


def _float_array_literal(values) -> str:
    """Exact float32 array literal: repr() of a float32-derived Python
    float is its shortest exact double form, and CAST .. AS FLOAT
    round-trips it to the identical float32 bits."""
    return "array(" + ", ".join(f"CAST({v!r} AS FLOAT)" for v in values) + ")"


def _centroid_matrix(cent_rows):
    """(cids int64 ascending, codebook float64 (k, dim)) from collected
    centroid rows."""
    import numpy as np

    cids = np.array([int(r["vec_id"]) for r in cent_rows], dtype=np.int64)
    C = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
    return cids, C


def _numpy_dist2(X, C):
    """Squared L2 of every row of X against every row of C, accumulated
    dimension-ascending in float64 — EXACTLY the IEEE order of the SQL
    left fold (``_dist2_spark``/``_dist2_sql``), so argmin decisions are
    bit-identical across the Arrow kernel, the inline-literal path, and
    the DuckDB oracle."""
    import numpy as np

    acc = np.zeros((X.shape[0], C.shape[0]), dtype=np.float64)
    for d in range(X.shape[1]):
        diff = X[:, d, None] - C[None, :, d]
        acc += diff * diff
    return acc


def train_ivf_codebook(
    embeddings: DataFrame,
    n_centroids: int | None = None,
    n_iters: int = 5,
    emb_col: str = "embedding",
):
    """Lloyd's k-means over the embedding table, Spark-native — the
    trained codebook the deterministic-subset quantizer stands in for
    (the subset stays the ORACLE path: k-means means are float sums
    whose cross-task order Spark doesn't fix, so a trained codebook is
    run-to-run approximate and can't be DuckDB-pinned; training is the
    classic non-SQL-expressible iterative algorithm).

    Returns (C float64 (k, dim), inertia_per_iter list).

    Scale shape (1e12 rows): each iteration is ONE mapInArrow pass over
    the table emitting per-BATCH partials — for every centroid touched
    by the batch, (cid, count, per-dim sums, sse) exploded to (cid,
    dim) rows — followed by a map-side-combined groupBy(cid, dim) sum
    whose output is exactly k*dim rows collected to the driver. No
    iteration shuffles the embedding table; state per task is k*dim
    float64 (a few MB at k=1000). Empty clusters keep their previous
    centroid (standard Lloyd fallback)."""
    import numpy as np
    import pyarrow as pa

    n_rows = embeddings.count()
    if n_centroids is None:
        n_centroids = ivf_centroids(n_rows)
    stride, offset = ivf_centroid_params(n_rows, n_centroids)
    init_rows = sorted(
        embeddings.where(F.expr(_centroid_filter(stride, offset)))
        .select("vec_id", emb_col)
        .collect(),
        key=lambda r: r["vec_id"],
    )
    C = np.array([r[emb_col] for r in init_rows], dtype=np.float64)
    k, dim = C.shape
    inertia = []

    src = embeddings.select(F.col(emb_col).alias("_emb"))
    for _ in range(n_iters):
        C_bc = C  # captured by value in the closure below

        def partials(batches, C_bc=C_bc):
            for batch in batches:
                n = batch.num_rows
                if n == 0:
                    continue
                X = (
                    batch.column(0)
                    .flatten()
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                    .reshape(n, dim)
                )
                d2 = _numpy_dist2(X, C_bc)
                best = np.argmin(d2, axis=1)
                sse = d2[np.arange(n), best]
                cids, inv = np.unique(best, return_inverse=True)
                counts = np.bincount(inv)
                sums = np.zeros((len(cids), dim), dtype=np.float64)
                np.add.at(sums, inv, X)
                sse_per = np.zeros(len(cids), dtype=np.float64)
                np.add.at(sse_per, inv, sse)
                m = len(cids)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.repeat(cids.astype(np.int64), dim)),
                        pa.array(np.tile(np.arange(dim, dtype=np.int64), m)),
                        pa.array(sums.reshape(-1)),
                        pa.array(np.repeat(counts.astype(np.int64), dim)),
                        pa.array(np.repeat(sse_per, dim)),
                    ],
                    names=["cid", "dim", "s", "n", "sse"],
                )

        agg = (
            src.mapInArrow(
                partials, schema="cid long, dim long, s double, n long, sse double"
            )
            .groupBy("cid", "dim")
            .agg(
                F.sum("s").alias("s"),
                F.sum("n").alias("n"),
                F.sum("sse").alias("sse"),
            )
            .collect()
        )
        new_C = C.copy()  # empty clusters keep their centroid
        total_sse = 0.0
        for r in agg:
            cid, d = int(r["cid"]), int(r["dim"])
            new_C[cid, d] = r["s"] / r["n"]
            if d == 0:
                total_sse += r["sse"]
        inertia.append(total_sse)
        C = new_C
    return C, inertia


def ivf_topk(
    embeddings: DataFrame,
    k: int = DEFAULT_K,
    n_centroids: int | None = None,
    codebook=None,
    n_rows: int | None = None,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid
    (inverted lists), probe the sqrt(k) nearest lists per query
    (``ivf_nprobe``), exact dot-product rerank inside the probed lists.

    ``n_centroids=None`` derives k ~ sqrt(n) (64 floor) from the corpus
    row count — the production entry point always takes this path, so
    inverted-list width shrinks as n grows instead of being pinned by a
    capacity constant (VERDICT round 3). Scale shape (1e12 rows): the
    codebook is materialized driver-side (k rows — a trained k-means
    codebook at real scale); small codebooks (<= IVF_INLINE_MAX) inline
    as literals so the assignment argmin is a pure Catalyst projection,
    larger ones broadcast as a numpy matrix into ONE mapInArrow pass —
    either way ZERO joins, windows, or shuffles touch the embedding
    table (round 2 rode every vector through a Window.partitionBy
    exchange). Probes come from the same codebook driver-side; the only
    pre-rerank data movement is broadcasting N_QUERIES * sqrt(k) probe
    rows into the assigned scan. ``n_rows`` skips the plan-time count
    job when the caller knows the corpus size (see ``lsh_topk``).

    ``codebook`` (a float64 (k, dim) numpy matrix, e.g. from
    ``train_ivf_codebook``) replaces the deterministic-subset quantizer
    entirely; centroid ids become 0..k-1 and the assignment always
    takes the Arrow path. The oracle gate never passes one (trained
    means are not cross-engine reproducible — see train_ivf_codebook)."""
    import numpy as np

    if codebook is not None:
        cids = np.arange(codebook.shape[0], dtype=np.int64)
        C = np.asarray(codebook, dtype=np.float64)
        cent_rows = None
        q_rows = sorted(
            embeddings.where(F.col("vec_id") < N_QUERIES)
            .select("vec_id", "embedding")
            .collect(),
            key=lambda r: r["vec_id"],
        )
    else:
        if n_rows is None:
            n_rows = _table_rows(embeddings)
        if n_centroids is None:
            n_centroids = ivf_centroids(n_rows)
        stride, offset = ivf_centroid_params(n_rows, n_centroids)
        # centroid subset AND the query rows in ONE collect (one scan,
        # one driver round-trip instead of two sequential jobs)
        both = sorted(
            embeddings.where(
                F.expr(_centroid_filter(stride, offset))
                | (F.col("vec_id") < N_QUERIES)
            )
            .select("vec_id", "embedding")
            .collect(),
            key=lambda r: r["vec_id"],
        )
        cent_rows = [
            r for r in both if r["vec_id"] % stride == offset
        ]
        q_rows = [r for r in both if r["vec_id"] < N_QUERIES]
        cids, C = _centroid_matrix(cent_rows)

    if cent_rows is not None and len(cent_rows) <= IVF_INLINE_MAX:
        structs = ", ".join(
            f"named_struct('d2', "
            f"{_dist2_spark('__emb__', _float_array_literal(r['embedding']))}, "
            f"'cid', CAST({int(r['vec_id'])} AS BIGINT))"
            for r in cent_rows
        )
        assigned = _spread(embeddings).select(
            "vec_id",
            "embedding",
            F.expr(
                f"array_min(array({structs.replace('__emb__', 'embedding')})).cid"
            ).alias("cid"),
        )
    else:
        import pyarrow as pa

        dim = C.shape[1]

        def assign(batches):
            for batch in batches:
                n = batch.num_rows
                if n == 0:
                    continue
                emb = batch.column(1)
                flat = emb.flatten().to_numpy(zero_copy_only=False)
                X = flat.astype(np.float64).reshape(n, dim)
                best = np.argmin(_numpy_dist2(X, C), axis=1)
                yield pa.RecordBatch.from_arrays(
                    [
                        batch.column(0),
                        emb,
                        pa.array(cids[best], type=pa.int64()),
                    ],
                    names=["vec_id", "embedding", "cid"],
                )

        assigned = _spread(embeddings.select("vec_id", "embedding")).mapInArrow(
            assign, schema="vec_id long, embedding array<float>, cid long"
        )

    # probes: nearest sqrt(k) centroids per query (ivf_nprobe),
    # computed driver-side in the same exact arithmetic
    # (ORDER BY d2, cid tie-break)
    n_probe = ivf_nprobe(len(cids))
    Q = np.array([r["embedding"] for r in q_rows], dtype=np.float64)
    d2q = _numpy_dist2(Q, C)
    probe_pairs = [
        (int(r["vec_id"]), int(cids[j]))
        for qi, r in enumerate(q_rows)
        for j in np.lexsort((cids, d2q[qi]))[:n_probe]
    ]
    spark = embeddings.sparkSession
    probes = spark.createDataFrame(
        probe_pairs, "query_id long, cid long"
    ).join(_queries(embeddings), "query_id")

    scored = (
        assigned.join(F.broadcast(probes), "cid")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("dot", F.expr(_dot_spark("embedding", "q")))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.col("rank").cast("bigint").alias("rank"))
    )


def ivf_topk_oracle(
    k: int = DEFAULT_K,
    table: str = "embeddings",
    n_centroids: int | None = None,
    n_rows: int | None = None,
) -> str:
    """Oracle mirror; ``n_rows`` feeds the same sqrt-derivation the
    Spark side computes at runtime (driver gate runs at a known size)."""
    if n_rows is None:
        raise ValueError("pass n_rows (and optionally n_centroids)")
    if n_centroids is None:
        n_centroids = ivf_centroids(n_rows)
    stride, offset = ivf_centroid_params(n_rows, n_centroids)
    cents = (
        f"SELECT vec_id AS cid, embedding FROM {table}\n"
        f"    WHERE {_centroid_filter(stride, offset)}"
    )
    # actual centroid count under the modulus filter (ids 0..n_rows-1)
    actual_k = (n_rows - offset + stride - 1) // stride
    return _ivf_oracle_body(cents, k, table, ivf_nprobe(actual_k))


def ivf_served_oracle(
    codebook,
    k: int = DEFAULT_K,
    table: str = "embeddings",
) -> str:
    """Oracle for IVF *serving* against a FIXED (e.g. k-means-trained,
    then frozen) codebook: the centroid CTE is a VALUES list of exact
    float64 literals instead of a table subset, so the assignment +
    probe + rerank pipeline — the deterministic part of trained IVF —
    is hash-checkable even though training itself is not (cross-task
    float-sum order). ``repr`` of a Python float is its shortest exact
    form, so the literals round-trip to the identical doubles numpy
    serves with (VERDICT round 4 item 1)."""
    rows = ",\n           ".join(
        f"({cid}, [{', '.join(repr(float(v)) for v in row)}])"
        for cid, row in enumerate(codebook)
    )
    cents = (
        f"SELECT * FROM (VALUES {rows}) AS t(cid, embedding)"
    )
    return _ivf_oracle_body(cents, k, table, ivf_nprobe(len(codebook)))


def _ivf_oracle_body(
    cents_sql: str, k: int, table: str, n_probe: int
) -> str:
    """Shared assign -> probe -> rerank oracle skeleton; ``cents_sql``
    supplies the codebook (table subset or frozen literals),
    ``n_probe`` the sqrt(k) probe width (``ivf_nprobe``)."""
    d_assign = _dist2_sql("e.embedding", "c.embedding")
    d_probe = _dist2_sql("q.embedding", "c.embedding")
    dot = _dot_sql("a.embedding", "p.embedding", True)
    return f"""
WITH cents AS (
    {cents_sql}
),
assigned AS (
    SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d_assign}, c.cid) AS r
        FROM {table} e CROSS JOIN cents c
    ) WHERE r = 1
),
probes AS (
    SELECT query_id, embedding, cid FROM (
        SELECT q.vec_id AS query_id, q.embedding, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {d_probe}, c.cid) AS r
        FROM {table} q CROSS JOIN cents c
        WHERE q.vec_id < {N_QUERIES}
    ) WHERE r <= {n_probe}
)
SELECT query_id, neighbor_id, rank FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY p.query_id ORDER BY {dot} DESC, a.vec_id
           ) AS BIGINT) AS rank
    FROM probes p
    JOIN assigned a ON a.cid = p.cid AND a.vec_id <> p.query_id
) WHERE rank <= {k}
""".strip()
