"""Training-data pipeline operators: text analysis, dedup, similarity,
multimodal plumbing — all built-in-function-first (JVM-side, whole-stage
codegen); Python only where semantics require it (Arrow-batched)."""
