"""Training-data pipeline operators beyond the reference's surface:
deduplication, similarity search, text analysis, multimodal plumbing.

Not present in SAIB-Inc/Argus (SURVEY.md §2 "explicitly absent" +
§7 Phase 5 north-star list); designed Spark-first for 100 TB corpora.
Every query has a DuckDB oracle built from the *same* deterministic
primitives (see ``hashing.py``) so the driver's value-hash compare
passes bit-for-bit.
"""
