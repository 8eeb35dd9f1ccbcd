"""Structured Streaming surface: windowed aggs, watermarks, sessionization."""
