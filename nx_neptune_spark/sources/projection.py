"""Table -> graph projection (reference A9/A11 parity).

The reference reshapes arbitrary SQL tables into Gremlin-CSV graph
form by generating Athena SELECTs that alias columns to ~id/~label/
~from/~to and join embedding tables
(/root/reference/nx_neptune/utils/utils.py:345-454
generate_projection_stmt; validation instance_management.py:1689-1766).
Spark-first: the projection IS a select with aliases; validation is a
schema assertion on the resulting DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NODE_REQUIRED = {"~id"}
EDGE_REQUIRED = {"~from", "~to"}


def project_nodes(
    df: DataFrame,
    col_id: str,
    label: str | Column = "Node",
    columns: list[str] | None = None,
    col_embedding: str | None = None,
    joins: list[tuple[DataFrame, Column]] | None = None,
) -> DataFrame:
    """SELECT id AS `~id`, label AS `~label`, cols..., array_join(emb,';')
    AS `embedding:vector` (utils.py:345-454). ``joins`` attach extra
    tables (e.g. an embedding table) before projecting."""
    base = df
    for other, cond in joins or []:
        base = base.join(other, cond)
    sel = [
        F.col(col_id).cast("string").alias("~id"),
        (F.lit(label) if isinstance(label, str) else label).alias("~label"),
    ]
    for c in columns or []:
        sel.append(F.col(c))
    if col_embedding is not None:
        # reference stores vectors ';'-joined (utils.py:423-431)
        sel.append(
            F.array_join(
                F.transform(F.col(col_embedding), lambda x: x.cast("string")), ";"
            ).alias("embedding:vector")
        )
    out = base.select(*sel)
    validate_projection(out, "NODE")
    return out


def project_edges(
    df: DataFrame,
    col_from: str,
    col_to: str,
    label: str | Column = "RELATES_TO",
    columns: list[str] | None = None,
) -> DataFrame:
    sel = [
        F.concat(
            F.col(col_from).cast("string"), F.lit("->"), F.col(col_to).cast("string")
        ).alias("~id"),
        F.col(col_from).cast("string").alias("~from"),
        F.col(col_to).cast("string").alias("~to"),
        (F.lit(label) if isinstance(label, str) else label).alias("~label"),
    ]
    for c in columns or []:
        sel.append(F.col(c))
    out = df.select(*sel)
    validate_projection(out, "EDGE")
    return out


def validate_projection(df: DataFrame, kind: str) -> bool:
    """Reference A11 (instance_management.py:1689-1766): NODE needs ~id,
    EDGE needs ~from/~to; embedding columns must use the
    'embedding:vector' naming rule."""
    cols = set(df.columns)
    required = NODE_REQUIRED if kind.upper() == "NODE" else EDGE_REQUIRED
    missing = required - cols
    if missing:
        raise ValueError(f"{kind} projection missing required columns: {missing}")
    for c in cols:
        if c.lower().startswith("embedding") and c != "embedding:vector":
            raise ValueError(
                f"embedding column must be named 'embedding:vector', got {c!r}"
            )
    return True
