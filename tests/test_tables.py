"""Data-lake table lifecycle parity tests (A4-A8/A10, B13 validators)."""

import pytest
from pyspark.sql import functions as F

from nx_neptune_spark.sources.tables import (
    create_csv_table,
    create_table_as,
    drop_table,
    fetch_results,
    run_ddl,
    validate_node_id,
    validate_sql_identifier,
)


def test_validators():
    assert validate_sql_identifier("db.table_1") == "db.table_1"
    assert validate_node_id("https://example.org/page/1")
    for bad in ["x; drop table y", "1tab le", "a'b"]:
        with pytest.raises(ValueError):
            validate_sql_identifier(bad)
    with pytest.raises(ValueError):
        validate_node_id("a b")


def test_csv_table_and_ctas_and_drop(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = str(tmp_path / "docs_csv")
    docs.select("doc_id", "lang", "n_chars").write.mode("overwrite").option(
        "header", True
    ).csv(p)
    create_csv_table(spark, "docs_csv_t", p)
    n = spark.sql("select count(*) from docs_csv_t").first()[0]
    assert n == docs.count()

    fmt = create_table_as(
        spark, "docs_ctas", spark.table("docs_csv_t").where(F.col("n_chars") > 100)
    )
    assert fmt in ("iceberg", "parquet")
    assert spark.table("docs_ctas").count() > 0

    run_ddl(spark, "CREATE OR REPLACE TEMP VIEW v1 AS SELECT 1 AS one")
    assert spark.table("v1").first()["one"] == 1

    res = fetch_results(spark.table("docs_ctas").select("doc_id", "lang"), limit=3)
    assert res[0] == ["doc_id", "lang"] and len(res) == 4

    drop_table(spark, "docs_ctas")
    drop_table(spark, "docs_csv_t")
    assert "docs_ctas" not in [t.name for t in spark.catalog.listTables()]


def test_iceberg_fallback_matches_exception_class(spark):
    """ADVICE r2: the parquet fallback fires only for the
    missing-DataSource exception class (DATA_SOURCE_NOT_FOUND /
    ClassNotFoundException), never by message substring -- a genuine
    write failure that merely MENTIONS iceberg/catalog must propagate."""
    from nx_neptune_spark.sources.tables import _is_missing_datasource_error

    # the real sandbox shape: this environment has no iceberg runtime
    try:
        spark.range(1).writeTo("t_probe_fallback").using("iceberg").createOrReplace()
        raise AssertionError("sandbox unexpectedly has iceberg")
    except Exception as e:
        assert _is_missing_datasource_error(e)
    # a failure whose MESSAGE mentions iceberg/catalog is not a match
    assert not _is_missing_datasource_error(
        RuntimeError("Iceberg commit conflict in catalog main at s3://...")
    )
    from pyspark.errors import AnalysisException
    try:
        spark.sql("SELECT * FROM definitely_missing_iceberg_catalog_tbl")
    except AnalysisException as e:
        assert not _is_missing_datasource_error(e)


class _FakeJException:
    """Duck-typed stand-in for a py4j JavaObject exception: just enough
    surface (getClass().getName(), getMessage(), getCause()) to drive
    _is_missing_datasource_error's cause-chain walk."""

    def __init__(self, cls_name, message=None, cause=None):
        self._cls, self._msg, self._cause = cls_name, message, cause

    def getClass(self):
        outer = self

        class _C:
            def getName(self):
                return outer._cls

        return _C()

    def getMessage(self):
        return self._msg

    def getCause(self):
        return self._cause

    def getCondition(self):
        return None

    def getErrorClass(self):
        return None


def test_iceberg_fallback_cnfe_must_name_iceberg():
    """ADVICE r3: a wrapped ClassNotFoundException only means 'iceberg
    runtime absent' when the missing class itself is iceberg-named; a
    CNFE for some other class (codec, catalog dep) must propagate
    rather than silently degrade the table to parquet."""
    from nx_neptune_spark.sources.tables import _is_missing_datasource_error

    def wrapped(cnfe_msg):
        e = RuntimeError("write failed")
        e.java_exception = _FakeJException(
            "org.apache.spark.SparkException",
            "Writing job aborted",
            _FakeJException("java.lang.ClassNotFoundException", cnfe_msg),
        )
        return e

    assert _is_missing_datasource_error(
        wrapped("org.apache.iceberg.spark.source.IcebergSource")
    )
    assert _is_missing_datasource_error(wrapped("iceberg.DefaultSource"))
    # missing codec / unrelated class: NOT a fallback trigger
    assert not _is_missing_datasource_error(
        wrapped("org.apache.hadoop.io.compress.ZStandardCodec")
    )
    assert not _is_missing_datasource_error(wrapped(None))
