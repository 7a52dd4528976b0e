"""Scalar function helpers (SURVEY.md §2.8) — thin wrappers that pin the
exact semantics the reference depends on (ICD truncation, age bucketing,
deterministic hashing) so every call site agrees."""
