"""Declared query inventory + DuckDB oracles for the correctness gate."""
