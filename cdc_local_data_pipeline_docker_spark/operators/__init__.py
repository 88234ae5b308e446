"""Relational operator surface (SURVEY.md §2.C EXT rows).

Every public function here takes ``(spark, sf_dir)`` and returns a lazy
DataFrame — one Catalyst plan, one action at the caller. Aggregates over
double columns are cast to DecimalType before summing so results are exact
and order-independent (bit-identical to the DuckDB oracle regardless of
partitioning / shuffle order)."""
