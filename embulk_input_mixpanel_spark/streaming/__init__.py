"""Structured Streaming ingestion paths."""
