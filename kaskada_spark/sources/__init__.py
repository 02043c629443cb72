"""Sources: batch/stream readers and the deterministic pre-tokenized
sequence table (the north-rule input shape)."""

from kaskada_spark.sources.readers import read_table, table_names
from kaskada_spark.sources.tokens import (
    TOKENS_ORACLE_CTE,
    synthesize_token_stream,
    tokenize_documents,
)

__all__ = [
    "read_table",
    "table_names",
    "tokenize_documents",
    "synthesize_token_stream",
    "TOKENS_ORACLE_CTE",
]
