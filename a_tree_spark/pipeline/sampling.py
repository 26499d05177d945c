"""Deterministic corpus sampling — the 100 TB-safe alternative to rng.

Training-data pipelines downsample by stratum (source, language,
quality band) when mixing a corpus. At scale the standard technique is
HASH sampling, not rng sampling: keep a document iff a hash of its
stable id falls under the stratum's threshold. That makes the sample
(a) reproducible across runs and engines, (b) join-free and
shuffle-free (a map-side filter the optimizer can push to the scan),
and (c) consistent — raising a stratum's rate later KEEPS every
previously sampled doc (thresholds are nested), which is what
incremental corpus rebuilds need. Spark's rng-based ``sampleBy`` has
none of these properties and can't be oracle-checked.

The bucket is the first 16 bits of md5("<doc_id>:<salt>"). The two
engines decode it differently (Spark: one ``conv(substr(md5,1,4))`` —
a single digest per row on the scan filter; DuckDB: instr/substr
nibble arithmetic, since DuckDB has no base-16 conv) but the VALUE is
identical, which is all the hash check needs. 16 bits = per-mille
granularity with integer-exact thresholds
(bucket * 1000 < permille * 65536).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HEX = "0123456789abcdef"

#: bucket space: first 4 md5 hex nibbles -> 0..65535
BUCKETS = 1 << 16


def _bucket_sql(dialect: str, salt: int) -> str:
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    h = f"md5(concat(CAST(doc_id AS {cast}), ':', CAST({salt} AS {cast})))"
    if dialect == "spark":
        # one digest per row: this predicate runs at the scan on the
        # 100 TB path, so don't lean on codegen CSE to dedupe 4 md5s
        return f"CAST(conv(substr({h}, 1, 4), 16, 10) AS BIGINT)"

    def nib(i: int, mult: int) -> str:
        return f"(instr('{_HEX}', substr({h}, {i}, 1)) - 1) * {mult}"

    return f"({nib(1, 4096)} + {nib(2, 256)} + {nib(3, 16)} + {nib(4, 1)})"


def _permille_case(fractions: dict[str, int], default_permille: int) -> str:
    for stratum, permille in {**fractions, "": default_permille}.items():
        if not (0 <= int(permille) <= 1000):
            raise ValueError(
                f"permille for {stratum or 'default'!r} must be in "
                f"[0, 1000], got {permille}"
            )
    if not fractions:   # a CASE with zero WHEN arms is a parse error
        return str(default_permille)
    arms = " ".join(
        # '' -> ''''; stratum values are data, not SQL
        f"WHEN '{stratum.replace(chr(39), chr(39) * 2)}' THEN {permille}"
        for stratum, permille in sorted(fractions.items())
    )
    return f"(CASE source {arms} ELSE {default_permille} END)"


def hash_stratified_sample(
    documents: DataFrame,
    fractions: dict[str, int],
    default_permille: int = 0,
    salt: int = 7,
) -> DataFrame:
    """Keep each doc iff bucket(doc_id, salt) < its stratum's permille
    threshold. ``fractions`` maps ``source`` values to permille
    (1000 = keep all); unlisted strata use ``default_permille``.

    Plan shape: one deterministic filter expression over the scan —
    no shuffle, no join, no rng state; Catalyst pushes the stratum
    CASE + hash compare into the file scan's filter, so at 100 TB the
    sample costs one read of the pruned columns. Changing ``salt``
    draws an independent sample; raising a permille strictly grows the
    previous sample (nested thresholds)."""
    keep = (
        f"{_bucket_sql('spark', salt)} * 1000 < "
        f"{_permille_case(fractions, default_permille)} * {BUCKETS}"
    )
    return documents.where(F.expr(keep)).select("doc_id", "source")


def hash_stratified_sample_oracle(
    fractions: dict[str, int],
    default_permille: int = 0,
    salt: int = 7,
    table: str = "documents",
) -> str:
    keep = (
        f"{_bucket_sql('duckdb', salt)} * 1000 < "
        f"{_permille_case(fractions, default_permille)} * {BUCKETS}"
    )
    return f"SELECT doc_id, source FROM {table} WHERE {keep}"


# ------------------------------------------------- token-budget mixing


def _budget_case(budgets: dict[str, int]) -> str:
    arms = " ".join(
        f"WHEN '{stratum.replace(chr(39), chr(39) * 2)}' THEN {int(budget)}"
        for stratum, budget in sorted(budgets.items())
    )
    return f"(CASE source {arms} ELSE 0 END)"


def token_budget_sample(
    documents: DataFrame, budgets: dict[str, int], salt: int = 7
) -> DataFrame:
    """Mix a corpus to per-stratum TOKEN budgets: measure each
    stratum's total BPE-ish token count, derive the integer permille
    that hits the budget (floor division, so the EXPECTED sampled
    token count never overshoots the budget; capped at 1000 when the
    stratum is smaller than its budget), and keep docs with the same
    nested hash-bucket rule as hash_stratified_sample.
    Strata without a budget are dropped (budget 0). This is the
    standard corpus-mixing step of a training-data pipeline, expressed
    so both the RATE DERIVATION and the SAMPLE are deterministic and
    oracle-checkable — integer arithmetic end to end, no rng.

    Plan shape: one map-side-combined groupBy(source) over the token
    expression (a scan aggregate), then a broadcast join of the tiny
    (stratum, permille) table back onto the corpus scan with the
    bucket filter — two passes over the data, zero wide shuffles of
    the corpus itself. At 100 TB the token totals come once per crawl
    and are cheap to persist; the second pass is the same scan-level
    filter as hash_stratified_sample."""
    from .text import bpe_token_count_sql

    for stratum, budget in budgets.items():
        if int(budget) < 0:
            raise ValueError(
                f"budget for {stratum!r} must be >= 0, got {budget}"
            )
    permille = (
        documents.groupBy("source")
        .agg(
            F.sum(F.expr(bpe_token_count_sql("spark"))).alias("n_tokens")
        )
        .select(
            "source",
            F.expr(
                "CAST(CASE WHEN n_tokens = 0 THEN 1000 ELSE "
                f"least(1000, (CAST({_budget_case(budgets)} AS BIGINT) "
                "* 1000) div n_tokens) END AS BIGINT)"
            ).alias("permille"),
        )
    )
    keep = f"{_bucket_sql('spark', salt)} * 1000 < permille * {BUCKETS}"
    return (
        documents.join(F.broadcast(permille), "source")
        .where(F.expr(keep))
        .select("doc_id", "source", "permille")
    )


def token_budget_sample_oracle(
    budgets: dict[str, int], salt: int = 7, table: str = "documents"
) -> str:
    from .text import bpe_token_count_sql

    return f"""
WITH toks AS (
    SELECT source, SUM({bpe_token_count_sql('duckdb')}) AS n_tokens
    FROM {table} GROUP BY source
),
pm AS (
    SELECT source,
           CAST(CASE WHEN n_tokens = 0 THEN 1000
                ELSE least(1000, (CAST({_budget_case(budgets)} AS BIGINT)
                           * 1000) // n_tokens) END AS BIGINT) AS permille
    FROM toks
)
SELECT d.doc_id, d.source, pm.permille
FROM {table} d JOIN pm USING (source)
WHERE {_bucket_sql('duckdb', salt)} * 1000 < pm.permille * {BUCKETS}
""".strip()


# --------------------------------------- quality-weighted resampling


def quality_permille_sql() -> str:
    """Per-document acceptance permille derived from the shared quality
    components (``text.quality_components_sql``): 3x the stopword
    ratio, clamped to [0, 1000] — documents that read like natural
    prose (stopword-dense) are kept with proportionally higher
    probability, boilerplate/token-soup with lower. Integer-exact and
    dialect-shared (FLOOR/length/replace only), so Spark and DuckDB
    compute the identical threshold."""
    from .text import N_STOPWORDS_SQL, N_TOKENS_SQL

    ratio = (
        f"CASE WHEN {N_TOKENS_SQL} = 0 THEN 0 ELSE "
        f"FLOOR(({N_STOPWORDS_SQL} * 1000) / {N_TOKENS_SQL}) END"
    )
    return f"CAST(LEAST(1000, ({ratio}) * 3) AS BIGINT)"


def quality_weighted_sample(documents: DataFrame, salt: int = 11) -> DataFrame:
    """Importance resampling by text quality — the per-document
    generalization of ``hash_stratified_sample``: instead of one
    permille per stratum, every document carries its OWN acceptance
    threshold (``quality_permille_sql``), and is kept iff its hash
    bucket falls under it. This is the standard quality-weighted
    sampling step of LLM training-data pipelines (CCNet-style: sample
    in proportion to a quality score rather than hard-filtering),
    made deterministic and engine-portable.

    Plan shape at 100 TB: still a single scan-level filter — the
    quality expression and the hash compare are one Catalyst
    predicate, no shuffle, no join, no rng state; raising the weight
    multiplier strictly grows the sample (nested thresholds, same
    property as the stratified form). Unlike rejection sampling with
    rng, re-running on a grown corpus keeps every previously sampled
    doc_id."""
    pm = quality_permille_sql()
    keep = f"{_bucket_sql('spark', salt)} * 1000 < ({pm}) * {BUCKETS}"
    return documents.where(F.expr(keep)).select(
        "doc_id", F.expr(pm).alias("quality_permille")
    )


def quality_weighted_sample_oracle(
    salt: int = 11, table: str = "documents"
) -> str:
    pm = quality_permille_sql()
    keep = f"{_bucket_sql('duckdb', salt)} * 1000 < ({pm}) * {BUCKETS}"
    return (
        f"SELECT doc_id, {pm} AS quality_permille "
        f"FROM {table} WHERE {keep}"
    )
