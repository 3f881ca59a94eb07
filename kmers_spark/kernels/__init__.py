"""Pure numpy codec kernels. No Spark imports here — these run inside
pandas UDF workers and in plain pytest. All byte layouts are fixed
little-endian (the reference's CI tests big-endian s390x to pin
byte-order independence; we pin '<' dtypes instead — SURVEY.md §5.1.5).
"""
