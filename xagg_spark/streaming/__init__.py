from .ingest import stream_aggregate, stream_decode

__all__ = ["stream_aggregate", "stream_decode"]
