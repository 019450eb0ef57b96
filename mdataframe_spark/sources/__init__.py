from .readers import (
    from_pandas,
    read_jsonl,
    read_orc,
    read_parquet,
    read_table_file,
    read_tsv,
)
from .writers import (
    write_bucketed_table,
    write_excel,
    write_jsonl,
    write_orc,
    write_parquet,
    write_tsv,
)

__all__ = [
    "read_parquet",
    "read_tsv",
    "read_table_file",
    "read_jsonl",
    "read_orc",
    "from_pandas",
    "write_tsv",
    "write_parquet",
    "write_excel",
    "write_jsonl",
    "write_orc",
    "write_bucketed_table",
]
