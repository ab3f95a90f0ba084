"""electrician_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference Go streaming-pipeline library
joeydtaylor/electrician (see SURVEY.md). Everything is declared through
the DataFrame/SQL API so Catalyst + Tungsten pick the physical strategy;
Pandas UDFs are used only where built-in operators cannot express the
semantics (DSP pack, custom codecs).

Layout:
    session       SparkSession factory (Arrow, AQE, UTC, deterministic shuffle)
    io            readers/writers: parquet, NDJSON(+gzip), JSON array, text,
                  time-partitioned path templates (reference S3 adapter parity)
    pipeline      electrician-shaped builder facade (wire/conduit = plan composition)
    functions.*   scalar/text/dsp function packs
    operators.*   relational, top-k, priority-queue, dedup, similarity ops
    streaming.*   structured-streaming windows/sources/sinks
    reliability   DLQ column pattern, retry, circuit-breaker harness
    queries       declared-query registry (the driver correctness surface)
"""

__version__ = "0.1.0"

from electrician_spark.session import get_session  # noqa: E402,F401
from electrician_spark.io import read_table, register_views  # noqa: E402,F401
from electrician_spark.pipeline import Pipeline  # noqa: E402,F401
