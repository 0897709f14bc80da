"""Structured Streaming ingestion (optional path; batch is primary)."""
