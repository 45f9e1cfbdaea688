"""Spark operators: each module is one SURVEY.md §2 operator family."""
