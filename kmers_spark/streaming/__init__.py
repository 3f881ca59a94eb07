"""Structured Streaming paths: micro-batch encode with exactly-once
block commits via foreachBatch + the manifest's commit markers."""
