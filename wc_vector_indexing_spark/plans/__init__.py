"""Declarative query plans: the relational operator catalog (SURVEY §2)
with DuckDB-oracle SQL mirrors."""
