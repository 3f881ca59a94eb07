"""DataFrame-level query operators.

Each function here takes (spark, sf_dir) and returns a DataFrame; every
computed column is aliased to match the DuckDB oracle SQL registered in
__spark_entry__.py (driver contract: identical column names/types).
"""
