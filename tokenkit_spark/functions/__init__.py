from .udfs import tokenize_col, tokenize_udf
from .native import try_tokenize_native

__all__ = ["tokenize_col", "tokenize_udf", "try_tokenize_native"]
