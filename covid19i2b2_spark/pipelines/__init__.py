"""The covid extraction pipeline (SURVEY.md §3) and its input adapters."""
