"""Relational/dataflow operators composed from DataFrame primitives."""
