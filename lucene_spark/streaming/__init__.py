from .ingest import StreamIndexer, append_to_index, stream_from_directory
from .sessions import run_sessionize_to_memory, streaming_sessionize
from .windows import run_windowed_to_memory, windowed_event_counts

__all__ = ["StreamIndexer", "append_to_index", "stream_from_directory",
           "windowed_event_counts", "run_windowed_to_memory",
           "streaming_sessionize", "run_sessionize_to_memory"]
