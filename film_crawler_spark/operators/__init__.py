"""Engine operators: frontier, seen-set, politeness, fetch/parse, dedup, similarity."""
