"""Spark DataFrame operators: the engine's public dataflow surface."""
