"""Column-level function library (vector math, text ops, shared hashing)."""

from clinical_vector_search_spark.functions import hashing, text, vector

__all__ = ["vector", "text", "hashing"]
