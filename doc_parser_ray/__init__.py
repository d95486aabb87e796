"""doc_parser_ray — a Ray-Data-native document/transcript extraction engine.

A from-scratch reimplementation of the data-processing capabilities of
genonai/doc_parser (Docling fork + GenOS preprocessor service) as an
idiomatic Ray Data streaming pipeline:

- per-turn payload extraction (HTML boilerplate strip / DOM heuristics,
  markdown, plain text, PDF layout-block text) as stateless
  ``map_batches(batch_format="pyarrow")`` transforms,
- conversation assembly (stable turn ordering, per-conversation counters)
  via ``groupby(conv_id).map_groups`` with explicit skew salting,
- chunking (HybridChunker semantics) and record assembly,
- checkpointed, partitioned Parquet output with per-partition lineage.

Reference semantics are cited per-function as ``/root/reference/<path>:<lines>``.
No code is copied from the reference; it is a BeautifulSoup/marko/
PyMuPDF-based single-process library, while this package re-derives the
same observable outputs on top of stdlib parsers + pyarrow + Ray Data.
"""

__version__ = "0.1.0"
