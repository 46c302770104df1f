"""Column-level function library: text analysis, vector math, multimodal
plumbing. All built on `pyspark.sql.functions` expressions (JVM-side,
whole-stage codegen) — Python/pandas UDFs appear only where expressions
genuinely cannot express the op (multimodal decode)."""
