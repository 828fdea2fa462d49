"""Operator library: CDC codegen, as-of joins, dedup, similarity, text."""
