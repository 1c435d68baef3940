"""efficient_query_expansion_spark — a PySpark-native full-text engine.

A from-scratch, Spark-first re-expression of the capabilities of
hpclab/efficient-query-expansion (CIKM'18): text normalization,
collection statistics (term / pair / triple windowed co-occurrence),
inverted-index construction (sorted, gap+varbyte compressed posting
lists with block-max metadata), CNF/BM25 top-k retrieval, thesaurus
candidate expansion, and the expansion-term featurizers — all as
DataFrame/SQL plans optimized by Catalyst, with vectorized Arrow
(pandas) UDFs on the few genuinely non-relational steps.

Nothing here is a port of the reference's C++/Cython execution engine;
reference files are cited in docstrings (``file:line`` into
/root/reference) only to document *what* is being computed.
"""

__version__ = "0.1.0"
