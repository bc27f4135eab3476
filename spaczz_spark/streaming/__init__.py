"""Structured Streaming surface: incremental near-duplicate detection."""
