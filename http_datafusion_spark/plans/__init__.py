from http_datafusion_spark.plans.registry import REGISTRY, QuerySpec, all_queries, query
from http_datafusion_spark.plans.tables import TABLES, load_tables

__all__ = ["REGISTRY", "QuerySpec", "TABLES", "all_queries", "load_tables", "query"]
