"""Structured Streaming wrapper for the parity pipeline (SURVEY §7 Phase 3)."""

from .job import StreamConfig, StreamMetrics, run_stream

__all__ = ["StreamConfig", "StreamMetrics", "run_stream"]
