"""Incremental / streaming execution of the extraction pipeline."""
