"""bdt_spark — a PySpark-native analytics engine with the capabilities of
datafusion-contrib/bdt ("Boring Data Tool"), rebuilt Spark-first.

The reference (/root/reference, bdt v0.18.0) is a thin CLI over DataFusion 35:
it registers files as tables by extension, delegates all SQL to the engine
(`ctx.sql`, src/bin/main.rs:182), and natively implements view/schema/count/
query/convert/compare/view-parquet-meta. This package mirrors that shape on
Spark: SparkSession-as-SessionContext, temp views as the catalog, Catalyst as
the optimizer, plus LLM-data-pipeline extension operators (dedup, similarity
search, text analysis, multimodal plumbing) designed for 100 TB scale.
"""

from bdt_spark.session import get_spark, stop_spark
from bdt_spark.sources.io import (
    register_table,
    register_dir,
    sanitize_table_name,
    table_name_from_path,
    load_fixture_tables,
    FIXTURE_TABLES,
)

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "stop_spark",
    "register_table",
    "register_dir",
    "sanitize_table_name",
    "table_name_from_path",
    "load_fixture_tables",
    "FIXTURE_TABLES",
]
