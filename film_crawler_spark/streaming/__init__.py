"""Structured Streaming adapters for the engine's event/metrics path."""
