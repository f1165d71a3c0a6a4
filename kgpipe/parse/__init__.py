"""Per-page-family extraction: the reference's parser semantics, re-expressed.

Each module exposes a pure-Python ``parse_*_html(html, url) -> dict``
(document-local, no I/O) plus the Spark-facing Arrow-batched UDF wrappers
in :mod:`kgpipe.parse.udfs`. The pure functions double as the independent
oracle used by the golden-triple tests.
"""
