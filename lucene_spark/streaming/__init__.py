from .ingest import StreamIndexer, append_to_index, stream_from_directory

__all__ = ["StreamIndexer", "append_to_index", "stream_from_directory"]
