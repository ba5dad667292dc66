from .incremental import encode_stream, streaming_daily_rollup, streaming_sessionize

__all__ = ["encode_stream", "streaming_daily_rollup", "streaming_sessionize"]
