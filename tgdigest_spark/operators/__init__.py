"""Query operators: digest semantics, dedup family, similarity, text."""
