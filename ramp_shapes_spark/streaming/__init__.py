"""Structured Streaming surface: incremental KG construction over
transcript drops (ingest.py)."""
