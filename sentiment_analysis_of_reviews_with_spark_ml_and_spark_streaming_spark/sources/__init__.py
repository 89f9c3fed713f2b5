from .io import load_table, load_tables, read_csv, write_parquet  # noqa: F401
