from .ingest import stream_ingest, streaming_backup_rollup  # noqa: F401
