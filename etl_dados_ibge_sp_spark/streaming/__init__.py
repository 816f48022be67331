from .windowed import stream_windowed_event_agg, streaming_dedup

__all__ = ["stream_windowed_event_agg", "streaming_dedup"]
