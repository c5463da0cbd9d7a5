from weatherdb_spark.plans.registry import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
