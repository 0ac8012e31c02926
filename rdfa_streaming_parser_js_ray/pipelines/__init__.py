"""End-to-end composed pipelines."""
