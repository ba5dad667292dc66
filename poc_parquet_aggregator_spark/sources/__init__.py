from .iceberg import has_iceberg, iceberg_input_files, read_sequence_table
from .tokens import generate_token_table, token_table_schema, write_token_table

__all__ = [
    "generate_token_table",
    "has_iceberg",
    "iceberg_input_files",
    "read_sequence_table",
    "token_table_schema",
    "write_token_table",
]
