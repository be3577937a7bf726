from .io import load_catalog, read_csv_glob, read_table, stage_parquet

__all__ = ["load_catalog", "read_csv_glob", "read_table", "stage_parquet"]
