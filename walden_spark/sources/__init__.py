"""Source/sink connectors (CSV/JSON/JDBC registry)."""
