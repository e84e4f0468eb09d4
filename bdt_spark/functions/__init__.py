"""Function-level extensions: conformance shims and Pandas-UDF-backed
operators (multimodal decode, feature extraction)."""
