from . import dedup_stream, ingest, stateful  # noqa: F401
