from .io import TABLES, load_table, load_tables, read_csv, read_json, sink_parquet

__all__ = ["TABLES", "load_table", "load_tables", "read_csv", "read_json", "sink_parquet"]
