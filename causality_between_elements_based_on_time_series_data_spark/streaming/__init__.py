from .events_stream import streaming_sliding_rollup, streaming_tumbling_rollup

__all__ = ["streaming_sliding_rollup", "streaming_tumbling_rollup"]
