"""Portable column-expression helpers.

"Portable" means: every helper here has an exactly-equivalent ANSI-SQL
formulation runnable by DuckDB, so operators built from them can be
oracle-checked value-for-value (driver contract in __spark_entry__.py).
That constrains the building blocks to md5/sha2, integer arithmetic,
and exact decimal aggregation — float summation order is never relied
upon.
"""
