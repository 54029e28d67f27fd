"""Spark-side engine: session, schemas, fused pipeline, checkpointing,
relational operators."""
