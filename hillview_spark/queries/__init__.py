from hillview_spark.queries.tpch import (
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier,
    q6_revenue_forecast,
)

__all__ = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue_forecast",
]
