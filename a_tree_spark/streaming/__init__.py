from .asof_stream import asof_stream
from .dedup_stream import dedup_stream
from .flows_stream import flows_stream
from .match_stream import match_stream, stateful_match_totals, windowed_match_counts
from .neardup_stream import neardup_dedup_stream, simhash_stream

__all__ = [
    "asof_stream",
    "dedup_stream",
    "flows_stream",
    "match_stream",
    "neardup_dedup_stream",
    "simhash_stream",
    "stateful_match_totals",
    "windowed_match_counts",
]
