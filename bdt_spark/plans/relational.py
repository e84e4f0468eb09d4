"""Tier B relational operator sweep (SURVEY.md §2 B2-B9) — populated next."""
