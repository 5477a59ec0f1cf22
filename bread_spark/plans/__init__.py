"""Physical-plan helpers: skew mitigation, partitioning strategies."""
