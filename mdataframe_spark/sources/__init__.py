from .readers import read_parquet, read_tsv, read_table_file, from_pandas
from .writers import write_tsv, write_parquet, write_excel

__all__ = [
    "read_parquet",
    "read_tsv",
    "read_table_file",
    "from_pandas",
    "write_tsv",
    "write_parquet",
    "write_excel",
]
