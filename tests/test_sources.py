"""Source-path contract tests: the Iceberg branch cannot run offline
(no iceberg-spark-runtime jar in this container), so the reader-call
construction is pinned with a mock — the deployment path is documented
in README.md (spark-submit --packages + catalog conf)."""

from types import SimpleNamespace

from tests.conftest import SF_DIR


class _ReaderSpy:
    def __init__(self):
        self.calls = []

    def format(self, fmt):
        self.calls.append(("format", fmt))
        return self

    def load(self, ident):
        self.calls.append(("load", ident))
        return SimpleNamespace(sentinel="iceberg-df")

    def parquet(self, path):
        self.calls.append(("parquet", path))
        return SimpleNamespace(sentinel="parquet-df")


def test_read_table_iceberg_branch_builds_catalog_identifier():
    from a_tree_spark.engine.session import read_table

    spy = _ReaderSpy()
    fake_spark = SimpleNamespace(read=spy)
    out = read_table(fake_spark, "iceberg:lake.web", "lineitem")
    assert out.sentinel == "iceberg-df"
    assert spy.calls == [("format", "iceberg"), ("load", "lake.web.lineitem")]


def test_read_table_parquet_branch_uses_sf_dir_path():
    from a_tree_spark.engine.session import read_table

    spy = _ReaderSpy()
    fake_spark = SimpleNamespace(read=spy)
    out = read_table(fake_spark, SF_DIR, "lineitem")
    assert out.sentinel == "parquet-df"
    assert spy.calls == [("parquet", f"{SF_DIR}/lineitem.parquet")]


def test_bucketed_cell_join_is_exchange_free(spark, tmp_path):
    """write_bucketed + same-key/same-count join: the executed plan must
    contain NO Exchange on either side (the shuffle was amortized into
    the write), and the result must equal the plain shuffled join. This
    is the 100 TB shape for the repeated cell_id joins of the spatial
    pipeline — the write pays the shuffle once."""
    from pyspark.sql import functions as F

    from a_tree_spark.engine.bucketing import is_exchange_free_join, write_bucketed
    from tests.conftest import SF_DIR

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", (F.col("event_id") % 97).alias("cell_id"), "value")
    )
    cells = (
        events.groupBy("cell_id").agg(F.count("*").alias("n_hist"))
    )

    spark.sql("DROP TABLE IF EXISTS b_events")
    spark.sql("DROP TABLE IF EXISTS b_cells")
    write_bucketed(events, "b_events", 8, ["cell_id"], sort_cols=["cell_id"],
                   path=str(tmp_path / "b_events"))
    write_bucketed(cells, "b_cells", 8, ["cell_id"], sort_cols=["cell_id"],
                   path=str(tmp_path / "b_cells"))

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_events").join(spark.table("b_cells"), "cell_id")
        assert is_exchange_free_join(joined)
        got = sorted(map(tuple, joined.select("event_id", "n_hist").collect()))
        plain = sorted(map(tuple, events.join(cells, "cell_id")
                           .select("event_id", "n_hist").collect()))
        assert got == plain and len(got) > 0
        # control: joining the bucketed table against an UNBUCKETED side
        # does shuffle (proves the assertion above is not vacuous)
        assert not is_exchange_free_join(
            spark.table("b_events").join(cells, "cell_id")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS b_events")
        spark.sql("DROP TABLE IF EXISTS b_cells")
