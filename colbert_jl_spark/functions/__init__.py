from colbert_jl_spark.functions.tokenizer import (
    extract_text,
    terms_col,
    tokens_col,
)

__all__ = ["extract_text", "terms_col", "tokens_col"]
