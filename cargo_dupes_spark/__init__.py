"""cargo_dupes_spark — a PySpark-native near-duplicate detection + clustering
engine over Common-Crawl-style web pages.

Brand-new implementation of the query semantics of ``mpecan/cargo-dupes``
(reference at /root/reference, a single-process Rust CLI over code ASTs),
re-expressed Spark-first over text:

    normalize → fingerprint → exact grouping → {MinHash/LSH, SimHash,
    winnowed-substring} candidate generation → vectorized Jaccard/Hamming
    verification → large-star/small-star connected components → group
    assembly → ignore anti-join → stats → report/check.

Everything is the DataFrame API + vectorized pandas/Arrow UDFs; no per-row
Python UDFs, no RDDs.
"""

__version__ = "0.1.0"
