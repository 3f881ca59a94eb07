"""Spark-side operators: encode/decode jobs, skew-aware partitioning."""
