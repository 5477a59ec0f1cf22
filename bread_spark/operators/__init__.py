"""Custom relational operators Spark lacks as built-ins (as-of join,
range join), expressed as compositions of DataFrame operations."""
