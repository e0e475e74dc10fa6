"""Data-lake table lifecycle (reference A3-A8/A10 parity, Spark-native).

The reference drives Athena with generated DDL/SQL strings and polls
query ids (/root/reference/nx_neptune/instance_management.py:
create_csv_table_from_s3 :1153-1263, _build_sql_statement :1266-1340,
iceberg CTAS :1343-1424, create from DDL :1427-1483, drop :1486-1548,
get_athena_query_results :1907-1947; DDL generator
nx_neptune/utils/utils.py:314-342). Spark needs none of the polling:
every step is a catalog call or a write. Iceberg CTAS maps to
``writeTo(...).using("iceberg")`` on clusters with the Iceberg runtime;
this sandbox has no Iceberg jar, so ``create_table_as`` falls back to
parquet ``saveAsTable`` transparently (same durable-table semantics).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

SQL_IDENTIFIER_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")
NODE_ID_RE = re.compile(r"^[a-zA-Z0-9_\-:.\/]+$")


def validate_sql_identifier(name: str) -> str:
    """Reference B13/A7 identifier allowlist (utils/utils.py:457-472,
    opencypher_builder.py:1026-1039): reject anything that could smuggle
    SQL into generated statements."""
    if not SQL_IDENTIFIER_RE.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


def validate_node_id(node_id: str) -> str:
    if not NODE_ID_RE.match(str(node_id)):
        raise ValueError(f"invalid node id: {node_id!r}")
    return str(node_id)


def create_csv_table(
    spark: SparkSession, table: str, path: str, header: bool = True
) -> None:
    """A4/A10: external CSV table over a directory (the reference infers
    types from `name:Type` headers; Spark's inferSchema plays that role,
    and read_vertex_csv/read_edge_csv handle the Gremlin typed headers).
    """
    validate_sql_identifier(table)
    # path is interpolated into a SQL string literal -> escape single
    # quotes (same anti-smuggling contract as validate_sql_identifier)
    safe_path = path.replace("'", "''")
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} USING csv "
        f"OPTIONS (path '{safe_path}', header '{str(header).lower()}', inferSchema 'true')"
    )


def _is_missing_datasource_error(e: Exception) -> bool:
    """True iff the exception says the 'iceberg' DataSource/runtime jar
    is not on the classpath: JVM SparkClassNotFoundException with
    error-class DATA_SOURCE_NOT_FOUND (or a bare ClassNotFoundException
    for the runtime jar), or a pyspark AnalysisException carrying the
    same error-class. Commit conflicts, validation and permission
    failures are different classes and propagate."""
    je = getattr(e, "java_exception", None)
    if je is not None:
        cond = None
        for attr in ("getCondition", "getErrorClass"):  # Spark >=4 / <4
            try:
                cond = getattr(je, attr)()
                break
            except Exception:
                continue
        if cond == "DATA_SOURCE_NOT_FOUND":
            return True
        # walk the cause chain: a missing catalog-plugin class surfaces
        # as SparkException *wrapping* the ClassNotFoundException. Only
        # an iceberg-named missing class means "runtime jar absent" —
        # a CNFE for some other class (codec, catalog dependency) is a
        # genuine failure and must propagate, not fall back to parquet
        # (ADVICE r3).
        seen = 0
        while je is not None and seen < 10:
            try:
                if je.getClass().getName().endswith("ClassNotFoundException"):
                    msg = str(je.getMessage() or "")
                    return "iceberg" in msg.lower()
                je = je.getCause()
            except Exception:
                break
            seen += 1
        return False
    try:
        from pyspark.errors import AnalysisException
    except ImportError:  # pragma: no cover
        return False
    if isinstance(e, AnalysisException):
        for attr in ("getCondition", "getErrorClass"):
            try:
                return getattr(e, attr)() == "DATA_SOURCE_NOT_FOUND"
            except Exception:
                continue  # only fall through to the deprecated name
    return False


def create_table_as(
    spark: SparkSession, table: str, df: DataFrame, fmt: str = "iceberg"
) -> str:
    """A5: durable CTAS. Tries Iceberg (`writeTo().using('iceberg')`),
    falls back to parquet saveAsTable when no Iceberg catalog is
    configured (this sandbox). Returns the format actually used."""
    validate_sql_identifier(table)
    if fmt == "iceberg":
        try:
            df.writeTo(table).using("iceberg").createOrReplace()
            return "iceberg"
        except Exception as e:
            # fall back ONLY when the Iceberg runtime itself is absent;
            # a real write failure (permissions, commit conflict, bad
            # partition spec) must not silently become a parquet table.
            # ADVICE r2: match the exception CLASS / Spark error-class,
            # not message substrings ('iceberg'/'catalog' appear in the
            # message of most genuine Iceberg write failures too).
            if not _is_missing_datasource_error(e):
                raise
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
    return "parquet"


def run_ddl(spark: SparkSession, ddl: str) -> None:
    """A6: caller-supplied DDL, executed as-is (the reference forwards
    `CREATE EXTERNAL TABLE` strings to Athena)."""
    spark.sql(ddl)


def drop_table(spark: SparkSession, table: str, if_exists: bool = True) -> None:
    """A7 (instance_management.py:1486-1548)."""
    validate_sql_identifier(table)
    spark.sql(f"DROP TABLE {'IF EXISTS ' if if_exists else ''}{table}")


def fetch_results(df: DataFrame, limit: int | None = None) -> list[list]:
    """A8 result-shape parity (get_athena_query_results returns
    list-of-rows with a header row, instance_management.py:1907-1947)."""
    rows = df.limit(limit).collect() if limit is not None else df.collect()
    return [list(df.columns)] + [list(r) for r in rows]
