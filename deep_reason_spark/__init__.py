"""deep_reason_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
``ngc436/deep-reason`` reference (see SURVEY.md).

The reference executes a LangGraph/asyncio pipeline against an LLM endpoint;
this package re-expresses the same *semantics* as declarative Spark DataFrame
plans: chunking is a window over an ordered corpus, extraction is a
vectorized ``mapInPandas`` stage, entity linking is a broadcast hash join,
canonicalization is an iterative connected-components dataflow, and the
graph is materialized as partitioned columnar tables.

Nothing here is a port — no reference code is reused. Reference files are
cited in docstrings (file:line) only to document behavioral parity.
"""

__version__ = "0.1.0"
