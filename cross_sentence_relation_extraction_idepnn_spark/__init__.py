"""PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the *computation* of
pgcool/Cross-sentence-Relation-Extraction-iDepNN (AAAI-19 iDepNN:
cross-sentence relation extraction over inter-sentential dependency
paths) as an idiomatic Spark DataFrame pipeline over transcript tables,
per SURVEY.md. Not a port: the reference is single-threaded Python-2 /
Theano; this engine is declarative Column algebra plus five vectorized
Arrow kernels (SURVEY.md §2.12).

Layout
------
- ``sources``    : transcript derivation, synthetic gold corpus, embedding table
- ``operators``  : segmentation, mentions, candidates, dedup, similarity,
                   text stats, graph/SDP featurization, scoring, linking, metrics
- ``functions``  : native Column text-normalization chain (T4–T13)
- ``plans``      : end-to-end pipeline with checkpoint/lineage/resume
- ``streaming``  : Structured Streaming ingest demo (out of parity scope)
"""

__version__ = "0.1.0"
