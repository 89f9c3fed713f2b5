from . import cdc, monitor, stateful  # noqa: F401
from .scoring import (  # noqa: F401
    read_socket_lines,
    score_stream,
    stream_dedup_within_watermark,
    windowed_event_counts,
)
