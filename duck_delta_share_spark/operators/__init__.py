"""Composite operators Spark lacks as single primitives (SURVEY.md §2B/§2C):
as-of join, dedup family, similarity search, top-k helpers. Each is a
composition of DataFrame ops chosen for shuffle economy at 100 TB."""
