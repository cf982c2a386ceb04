"""Corpus sources/sinks.

Iceberg is the mandated production format (BASELINE.json north_star);
its runtime jars are not in this container, so the Iceberg path is
attempted first and parquet (identical layout) is the tested fallback.
"""

from .corpus_io import load_corpus, write_corpus  # noqa: F401
