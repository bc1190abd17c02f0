from .log_stream import fold_stream_foreach_batch, windowed_event_counts  # noqa: F401
