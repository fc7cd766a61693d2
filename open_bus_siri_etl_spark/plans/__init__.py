"""Query catalog surfaced through __spark_entry__.py (driver contract)."""
