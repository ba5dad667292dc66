from .incremental import encode_stream, streaming_daily_rollup

__all__ = ["encode_stream", "streaming_daily_rollup"]
