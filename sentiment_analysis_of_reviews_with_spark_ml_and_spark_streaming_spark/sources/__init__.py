from .io import (  # noqa: F401
    load_table,
    load_tables,
    read_csv,
    read_jsonl,
    read_parquet_evolved,
    write_parquet,
)
from .lakehouse_stream import register_lakehouse_source  # noqa: F401
