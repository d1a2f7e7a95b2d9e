"""arrow_udf_spark — a PySpark-native re-expression of the arrow-udf
UDF framework (reference: /root/reference, arrow-udf 0.9.0), extended with
large-scale data-pipeline operators (dedup, similarity, text analysis).

Public API::

    from arrow_udf_spark import udf, udtf, udaf, CallMode, Registry
"""

from .plans.registry import GLOBAL, Registry, Signature
from .plans.types import (EXT_DECIMAL, EXT_JSON, EXT_PICKLE, ExtField,
                          parse_type, set_extension_metadata_key,
                          set_extension_value, struct_type)
from .operators.scalar import CallMode, ScalarFunction, udf
from .operators.table import TableFunction, udtf
from .operators.aggregate import AggregateFunction, udaf
from .session import bootstrap, configure, get_spark
from .operators.temporal import asof_join, range_join, sessionize
from .operators.sampling import hash_sample, pack_sequences, weighted_sample
from .operators.skew import salted_join, skew_agg
from .operators.dedup import dup_clusters, exact_dedup
from . import functions  # noqa: F401  (self-registers the built-in corpus)

__all__ = [
    "asof_join",
    "sessionize",
    "range_join",
    "hash_sample",
    "pack_sequences",
    "weighted_sample",
    "salted_join",
    "skew_agg",
    "dup_clusters",
    "exact_dedup",
    "udf",
    "udtf",
    "udaf",
    "CallMode",
    "Registry",
    "Signature",
    "GLOBAL",
    "ExtField",
    "parse_type",
    "struct_type",
    "EXT_JSON",
    "EXT_DECIMAL",
    "EXT_PICKLE",
    "set_extension_metadata_key",
    "set_extension_value",
    "ScalarFunction",
    "TableFunction",
    "AggregateFunction",
    "get_spark",
    "configure",
    "bootstrap",
]

__version__ = "0.1.0"
