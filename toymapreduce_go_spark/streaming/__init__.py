from .events_stream import stream_events_tumbling, stream_sessionize

__all__ = ["stream_events_tumbling", "stream_sessionize"]
