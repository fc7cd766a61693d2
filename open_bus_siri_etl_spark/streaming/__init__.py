"""Incremental ingest: the reference's 60 s daemon (EP2) as a driver loop and
as a Structured Streaming file-source query."""
