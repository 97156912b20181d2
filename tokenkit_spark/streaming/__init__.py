from .ingest import (
    latest_index_path,
    load_latest_index,
    prune_generations,
    stream_index_updates,
)
from .stats import (
    crawl_stats,
    first_seen_pages,
    read_pages_stream,
)

__all__ = [
    "stream_index_updates",
    "latest_index_path",
    "load_latest_index",
    "prune_generations",
    "crawl_stats",
    "first_seen_pages",
    "read_pages_stream",
]
