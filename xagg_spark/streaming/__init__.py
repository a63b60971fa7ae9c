from .dedup import stream_dedup_exact
from .ingest import (stream_aggregate, stream_decode,
                     stream_events_hourly, stream_sessions)

__all__ = ["stream_aggregate", "stream_decode", "stream_dedup_exact",
           "stream_events_hourly", "stream_sessions"]
