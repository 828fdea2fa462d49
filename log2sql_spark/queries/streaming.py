"""Streaming-analog query registrations. Populated in M3."""
