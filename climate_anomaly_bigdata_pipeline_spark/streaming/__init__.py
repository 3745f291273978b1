"""Structured Streaming variants of the engine's temporal operators."""
