"""Sinks: ES-bulk-shaped output (SURVEY §2.8)."""

from .bulk import ParquetIndexSink, to_bulk_actions

__all__ = ["ParquetIndexSink", "to_bulk_actions"]
