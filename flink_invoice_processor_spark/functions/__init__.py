"""Scale-path operator extensions beyond the reference surface:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search, text analysis, multimodal column plumbing.

These are the operators a 100 TB training-data pipeline needs; each is
designed partition-parallel with no driver-side collects, and — where the
math allows — built on md5-based hashing so a DuckDB oracle can reproduce
results bit-for-bit.
"""
