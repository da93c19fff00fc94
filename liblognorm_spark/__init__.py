"""liblognorm_spark — a PySpark-native log-normalization analytics engine.

A from-scratch reimplementation of the capabilities of rsyslog/liblognorm
(reference: /root/reference, v2 PDAG engine) as an idiomatic PySpark
pipeline: rulebase -> compiled vectorized matcher (anchored regex
alternations evaluated inside Arrow/pandas batches, exact-semantics Python
walker for the rare hard motifs) -> broadcast-join enrichment -> tag-based
fan-out routing -> per-sink aggregation.

The public API:

    from liblognorm_spark import Rulebase, normalize_df, session

    rb = Rulebase.from_string(RULEBASE_TEXT)
    out = normalize_df(df, rb, text_col="text")   # adds tags/fields_json/unparsed

Nothing in this package is a port of the reference's C code; the reference
defines *what* to compute (motif semantics, tag/annotation model, routing
and counter behavior, cited by file:line in docstrings), while execution is
Spark DataFrame/Catalyst native.
"""

from liblognorm_spark.rulebase.loader import Rulebase
from liblognorm_spark.runtime.matcher import normalize_df, normalize_strings
from liblognorm_spark.session import get_spark

__all__ = ["Rulebase", "normalize_df", "normalize_strings", "get_spark"]

__version__ = "0.1.0"
