from .catalog import REGISTRY, Query, load_all_plans, query

__all__ = ["REGISTRY", "Query", "load_all_plans", "query"]
