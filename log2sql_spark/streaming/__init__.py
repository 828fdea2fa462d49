"""Structured Streaming surface: online CDC, windowed aggs, stateful ops."""
