"""Relational + training-data operators, each with a DuckDB oracle where
SQL-expressible (see __spark_entry__ for the full wiring)."""
