"""Structured Streaming operators (SURVEY §2.2 row 'Streaming')."""
