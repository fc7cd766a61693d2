"""SQL API surface: run ANSI SQL directly against the testdata tables via
``spark.sql`` — the interface a reference user coming from a SQL engine
reaches for first.

``register_views`` exposes every parquet table as a temp view (through the
same dtype-adaptive reader the catalog uses, so timestamp semantics match);
``sql`` is then a one-call query runner.  Because the catalog's DuckDB
oracle strings are written in portable ANSI (explicit CASTs, TIMESTAMP
literals, standard join/window syntax), many of them execute UNCHANGED on
Spark — ``tests/test_sqlapi.py`` asserts a sample produces row-identical
results to the DataFrame plans, which is the strongest form of the
"a reference user can switch" claim: same query text, same answers, two
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import t

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the star-schema tables as temp views for ``spark.sql``."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run one ANSI-SQL query against the ``sf_dir`` tables."""
    register_views(spark, sf_dir)
    return spark.sql(query)
