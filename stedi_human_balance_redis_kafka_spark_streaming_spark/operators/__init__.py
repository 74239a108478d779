"""Operator library: pure ``DataFrame -> DataFrame`` transforms.

Every transform works identically on batch and streaming DataFrames
(SURVEY.md §7 design stance), so correctness is established in batch
against the DuckDB oracle and the streaming path inherits it.
"""
