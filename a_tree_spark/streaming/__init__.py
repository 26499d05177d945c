from .match_stream import match_stream, stateful_match_totals, windowed_match_counts

__all__ = ["match_stream", "stateful_match_totals", "windowed_match_counts"]
