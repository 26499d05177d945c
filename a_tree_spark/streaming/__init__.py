from .match_stream import match_stream, windowed_match_counts

__all__ = ["match_stream", "windowed_match_counts"]
