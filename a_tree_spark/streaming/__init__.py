from .dedup_stream import dedup_stream
from .match_stream import match_stream, stateful_match_totals, windowed_match_counts

__all__ = [
    "dedup_stream",
    "match_stream",
    "stateful_match_totals",
    "windowed_match_counts",
]
