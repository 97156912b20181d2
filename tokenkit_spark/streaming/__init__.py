from .ingest import (
    latest_index_path,
    load_latest_index,
    prune_generations,
    stream_index_updates,
)

__all__ = [
    "stream_index_updates",
    "latest_index_path",
    "load_latest_index",
    "prune_generations",
]
