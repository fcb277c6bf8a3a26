"""hillview_spark — a PySpark-native analytics engine with the query
surface of vmware/hillview (sketch/map spreadsheet engine), rebuilt
Spark-first.

Every Hillview *sketch* (mergeable aggregation) maps to a Catalyst
aggregation with map-side partial combine; every Hillview *map*
(row transformation) maps to a narrow DataFrame transformation.
See SURVEY.md for the full inventory.
"""

from hillview_spark.session import get_spark
from hillview_spark.tables import load_table, load_all, TABLE_NAMES

__all__ = ["get_spark", "load_table", "load_all", "TABLE_NAMES"]
__version__ = "0.1.0"
