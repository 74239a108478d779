"""Query plans: the engine's registered queries and their DuckDB oracles."""
