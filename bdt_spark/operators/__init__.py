"""Native operators reimplementing the reference's Tier A surface
(SURVEY.md §2): convert, compare, parquet metadata."""
