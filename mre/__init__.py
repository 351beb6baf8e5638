"""mre — a from-scratch, PySpark-native news-article extraction engine.

Capabilities of ``bcampbell/metareadability`` (headline / pubdate / byline
extraction from raw news-article HTML; see SURVEY.md) plus arc90-style main
content extraction, re-expressed as vectorized pandas/Arrow UDFs over Spark
DataFrames — never a port (the reference at /root/reference was empty at
survey time; behavior is specified by SURVEY.md + FIXTURES.md and the
``[PUB:*]`` citations therein).

Layout
------
``mre.schema``      — authoritative StructTypes (pages / extract / lineage)
``mre.core``        — pure-Python extraction stages E1–E15 (no Spark imports)
``mre.pipeline``    — Spark pipeline operators P1–P10 (dedup, salt, extract,
                      lineage, resume, golden diff)
``mre.io``          — source/sink abstraction (parquet in sandbox, Iceberg in
                      prod behind the same call sites)
``mre.fixtures``    — deterministic synthetic corpus (FIXTURES.md spec)
``mre.textops``     — training-data ops over document tables: dedup (exact,
                      MinHash-LSH, SimHash, n-gram Jaccard), ANN similarity,
                      language-ID, quality scoring, token counts, fingerprints
``mre.multimodal``  — binary-column (image/audio) plumbing, decode stubbed
``mre.streaming``   — Structured Streaming variant of the extract pipeline
"""

__version__ = "0.1.0"
