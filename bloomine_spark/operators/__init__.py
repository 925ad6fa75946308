"""DataFrame-level operators: two-phase screen, cascade, dedup, similarity."""
