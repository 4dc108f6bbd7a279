"""Corpus ingest + parse stage (content string -> citation rows)."""
