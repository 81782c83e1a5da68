"""Pure-pandas/stdlib extraction kernels.

These run *inside* Arrow batches (``mapInPandas`` / ``pandas_udf``) on the
executors, and are importable without a SparkSession so they can be unit
tested directly (SURVEY.md §5 "unit tests per operator").
"""
