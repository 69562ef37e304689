"""Existing-table sources (S7): catalog tables and parquet paths."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def table_source(spark: SparkSession, name: str) -> DataFrame:
    """Bind an existing catalog table; raise if missing
    (reference: lib/voter_file/csv_driver.rb:132-145)."""
    if not spark.catalog.tableExists(name):
        raise NameError(f"table does not exist: {name}")
    return spark.table(name)


def parquet_source(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
