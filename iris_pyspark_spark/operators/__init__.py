"""Reusable custom operators (DataFrame → DataFrame).

Each operator Spark lacks natively is built as a composition of
built-in DataFrame ops where the semantics allow (as-of join,
sessionization, minhash, cosine top-k), falling back to Arrow-batched
pandas UDFs only where genuinely required (SURVEY.md §4).
"""
