"""DataFrame-level operators: scalable reservoir aggregation, dedup,
similarity search, multimodal column plumbing."""
