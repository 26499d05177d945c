from .matcher import match_events
from .session import get_spark, read_table

__all__ = ["get_spark", "match_events", "read_table"]
