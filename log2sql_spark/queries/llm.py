"""LLM-pipeline operator query registrations. Populated in M4."""
