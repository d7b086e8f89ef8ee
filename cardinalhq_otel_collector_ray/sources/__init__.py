from .parquet import read_table, table_num_rows  # noqa: F401
from .tokenized import build_vocab, tokenized_documents  # noqa: F401
