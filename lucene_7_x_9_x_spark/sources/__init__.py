"""Input sources: connectors from external formats to the corpus schema."""

from .warc import parse_warc_bytes, read_warc  # noqa: F401
