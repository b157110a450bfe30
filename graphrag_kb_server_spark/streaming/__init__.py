"""Incremental / streaming-style indexing."""
