"""Structured Streaming extension (SURVEY.md §2.9/§7.3 step 10).

The reference has no data-plane streaming — only WebSocket progress
events. This package is the capability extension the survey plans:
event-time ingestion with watermarks feeding the same logical operators
the batch engine uses."""
