"""Query plans: the engine's declared query surface (each with a DuckDB
oracle where SQL-expressible) and plan-inspection helpers."""
