"""Query plans: the engine's declared operator manifest (SURVEY.md §2)
expressed as runnable queries over the driver's test tables, each paired
with a DuckDB oracle SQL where the semantics are ANSI-SQL-expressible."""
