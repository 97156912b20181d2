from .core import Analyzer, get_analyzer, tokenize

__all__ = ["Analyzer", "get_analyzer", "tokenize"]
