from efficient_query_expansion_spark.functions.normalize import (  # noqa: F401
    normalize_text_py,
    normalize_hyphens_py,
    normalize_multiword_py,
    normalize_aliases_raw_py,
    normalize_text_udf,
    normalize_hyphens_udf,
    normalize_multiword_udf,
)
