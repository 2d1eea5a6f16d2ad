"""Native Spark column-expression function library (no UDFs)."""
