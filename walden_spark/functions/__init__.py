"""UDF surface (SURVEY §2.10): SQL-bodied functions, pandas UDFs,
Python UDTFs, cogroup grouped-map. See functions/udf.py."""

from walden_spark.functions.udf import (  # noqa: F401
    batch_median,
    make_word_udtf,
    register_sql_functions,
    zscore_clip,
)
