from p6_spark.plans.registry import QUERIES, Query, get_queries, get_oracles

__all__ = ["QUERIES", "Query", "get_queries", "get_oracles"]
