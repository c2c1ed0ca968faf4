"""Engine function library: aggregates, joins, dedup, text, similarity."""
