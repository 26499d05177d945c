from .bucketing import is_exchange_free_join, write_bucketed
from .matcher import match_events
from .session import get_spark, read_table

__all__ = [
    "get_spark",
    "is_exchange_free_join",
    "match_events",
    "read_table",
    "write_bucketed",
]
