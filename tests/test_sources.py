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
