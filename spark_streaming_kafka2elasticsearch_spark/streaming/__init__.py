"""Structured Streaming layer: sinks, jobs, and streaming semantics."""
