from .kv_stream import kv_state_stream
from .windows import hourly_event_counts_stream, user_session_stream

__all__ = ["kv_state_stream", "hourly_event_counts_stream", "user_session_stream"]
