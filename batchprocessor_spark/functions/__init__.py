"""Scalar-function query families and LLM text/multimodal pipelines.
Importing this package registers the q_fn_* / q_llm_* queries."""

from batchprocessor_spark.functions import (  # noqa: F401
    multimodal,
    scalar,
    text,
    udf,
)
