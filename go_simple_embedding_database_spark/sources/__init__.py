from go_simple_embedding_database_spark.sources.json_wire import (
    record_to_json,
    collection_to_json,
    database_to_json,
    database_to_file,
    database_from_file,
    wire_records_df,
)
from go_simple_embedding_database_spark.sources.tables import load_table, load_tables

__all__ = [
    "record_to_json",
    "collection_to_json",
    "database_to_json",
    "database_to_file",
    "database_from_file",
    "wire_records_df",
    "load_table",
    "load_tables",
]
