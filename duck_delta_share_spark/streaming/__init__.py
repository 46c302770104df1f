"""Structured Streaming pipelines over the events table (SURVEY.md §2B
streaming row): watermarked windowed aggregation and stateful
sessionization. The reference has no streaming surface; these are the
engine-capability extensions for the `events` fixture."""
