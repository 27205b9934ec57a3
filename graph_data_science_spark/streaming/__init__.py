"""Structured Streaming surface (net-new vs the reference, which has no
streaming analog — SURVEY §2.7): incremental ingest of the events stream
with watermarked windowed aggregation, plus batch sessionization."""
