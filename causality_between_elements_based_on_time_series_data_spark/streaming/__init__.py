from .events_stream import streaming_tumbling_rollup

__all__ = ["streaming_tumbling_rollup"]
