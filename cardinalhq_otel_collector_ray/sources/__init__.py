from .parquet import read_table, table_num_rows  # noqa: F401
from .sinkfiles import list_sink_files, read_sink_output  # noqa: F401
from .tokenized import build_vocab, tokenized_documents  # noqa: F401
