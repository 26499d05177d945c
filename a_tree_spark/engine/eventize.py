"""Eventization: derive the typed attribute columns the matcher consumes.

The reference's EventBuilder (src/events.rs:41-180) constructs typed
rows by hand; Spark-first, eventization is a projection — every derived
attribute is a deterministic JVM-side expression (no Python), written so
the exact same derivation is expressible in DuckDB for the correctness
oracle (tests/driver run both and diff).

``eventize_events`` maps the driver-provided ``events`` table
(event_id, ts, user_id, event_type, value DOUBLE, props JSON-ish) onto
all six attribute kinds of the reference type system (SURVEY.md §1.2),
including deterministic NULLs so three-valued logic is exercised.

Determinism notes (oracle parity):
- double -> bigint uses FLOOR then cast (DuckDB CAST rounds, Spark
  truncates — FLOOR first makes them agree);
- double -> decimal(28,6) rounding only differs at exact .5e-6
  boundaries, which IEEE doubles essentially never hit;
- regexp is restricted to [0-9]+ (identical in Java regex and RE2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..expr.schema import AttributeDefinition as A, AttributeTable

EVENT_ATTRIBUTES = AttributeTable([
    A.integer("user_id"),
    A.string("event_type"),
    A.integer("hour"),
    A.integer("k"),
    A.integer("value_cents"),
    A.float("amount"),
    A.boolean("flag"),
    A.string("maybe_type"),
    A.string_list("tags"),
    A.integer_list("seg_ids"),
])


def eventize_events(events: DataFrame) -> DataFrame:
    """Spark-side derivation of the attribute columns."""
    k = F.regexp_extract(F.col("props"), "([0-9]+)", 1).cast("bigint")
    return events.select(
        F.col("event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("event_type"),
        F.hour("ts").cast("bigint").alias("hour"),
        k.alias("k"),
        F.floor(F.col("value") * 100).cast("bigint").alias("value_cents"),
        F.col("value").cast("decimal(28,6)").alias("amount"),
        (F.col("user_id") % 2 == 0).alias("flag"),
        F.when(F.col("user_id") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("event_type"))
        .alias("maybe_type"),
        F.when(
            F.col("user_id") % 11 == 0, F.array().cast("array<string>")
        ).otherwise(
            F.split(
                F.concat_ws(
                    ",",
                    F.col("event_type"),
                    F.concat(F.lit("u"), (F.col("user_id") % 5).cast("string")),
                ),
                ",",
            )
        ).alias("tags"),
        F.array(
            F.col("user_id").cast("bigint"),
            (F.col("user_id") + 100).cast("bigint"),
            (k % 50).cast("bigint"),
        ).alias("seg_ids"),
    )


EVENTIZE_DUCKDB_CTE = """
SELECT
    event_id,
    CAST(user_id AS BIGINT) AS user_id,
    event_type,
    CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
    CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) AS k,
    CAST(FLOOR(value * 100) AS BIGINT) AS value_cents,
    CAST(value AS DECIMAL(28,6)) AS amount,
    (user_id % 2 = 0) AS flag,
    CASE WHEN user_id % 7 = 0 THEN NULL ELSE event_type END AS maybe_type,
    CASE WHEN user_id % 11 = 0 THEN CAST([] AS VARCHAR[])
         ELSE string_split(event_type || ',' || 'u' || CAST(user_id % 5 AS VARCHAR), ',')
    END AS tags,
    [CAST(user_id AS BIGINT), CAST(user_id + 100 AS BIGINT),
     CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT) % 50] AS seg_ids
FROM events
""".strip()


# A fixed subscription workload over the eventized table, exercising
# every leaf operator family (SURVEY.md §2.1), flat and/or precedence,
# NOT/NNF, reversed operands, NULL and empty-list edges.
STANDING_SUBSCRIPTIONS: dict[int, str] = {
    1: "event_type = 'click'",
    2: "event_type <> 'click' and flag",
    3: "user_id in [1, 3, 5, 7, 9]",
    4: "user_id not in [0, 2, 4]",
    5: "value_cents > 10000",
    6: "value_cents <= 500 or value_cents >= 30000",
    7: "10 < user_id",                              # reversed operand
    8: "amount > 100.5",
    9: "amount <= 0.25",
    10: "not flag",
    11: "not user_id > 7",
    12: "maybe_type is null",
    13: "maybe_type is not null and maybe_type = 'error'",
    14: "tags one of ['click', 'u1']",
    15: "tags none of ['error', 'signup']",
    16: "tags all of ['click', 'view', 'u0', 'u1', 'u2', 'u3', 'u4', 'purchase', 'signup', 'error']",
    17: "seg_ids one of [3, 7, 11, 103]",
    18: "seg_ids all of [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 100, 101, 102, 103, 104, 105, 106, 107, 108, 109, 110, 111, 112, 113, 114, 115, 116, 117, 118, 119, 120, 121, 122, 123, 124, 125, 126, 127, 128, 129, 130, 131, 132, 133, 134, 135, 136, 137, 138, 139, 140, 141, 142, 143, 144, 145, 146, 147, 148, 149]",
    19: "tags is not empty",
    20: "hour < 6 and flag or hour >= 18 and not flag",  # flat precedence
    21: "event_type = 'purchase' and value_cents > 5000 and user_id in [2, 4, 6, 8] "
        "or event_type = 'error' and k > 50",
    22: "k in [0, 10, 20, 30, 40, 50, 60, 70, 80, 90] and not (event_type = 'view')",
    23: "(event_type = 'click' or event_type = 'view') and seg_ids one of [1, 2, 3, 4, 5]",
    24: "amount > 150.0 and amount <= 300.0",
    25: "not (flag and event_type = 'click') and user_id >= 10",
    # the two DSL forms round 1 left pytest-only (VERDICT.md): a negated
    # all-of (internal NOT_ALL_OF, reference src/predicates.rs:429-432)
    # and the positive is-empty (src/predicates.rs:491-494); user_id%11
    # rows have empty tags so both match real rows.
    26: "not (tags all of ['click', 'view', 'u0', 'u2'])",
    27: "tags is empty",
}
