"""Dataflow operators (stage = DataFrame -> DataFrame)."""
