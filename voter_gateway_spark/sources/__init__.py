from voter_gateway_spark.sources.csv_source import CSVSource
from voter_gateway_spark.sources.jsonl_source import JSONLSource
from voter_gateway_spark.sources.table_source import parquet_source, table_source

__all__ = ["CSVSource", "JSONLSource", "parquet_source", "table_source"]
