"""pdf_brain_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference knowledge-base system
(joelhooks/pdf-brain), re-expressed Spark-first for 100 TB scale.

Everything is DataFrame/SQL-first: declarative plans for Catalyst, built-in
functions on the hot path, Arrow-batched pandas UDFs only where built-ins
genuinely can't express the semantics (chunking, model calls).
"""

__version__ = "0.1.0"
