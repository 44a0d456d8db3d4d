"""Large-scale training-data operators built on the same Spark-first
principles as the shape engine: built-in functions in the hot path,
broadcast/AQE-friendly join shapes, deterministic hashing (md5-based so
oracle engines reproduce bit-identical results)."""
