from .relational import asof_join, topk_per_group

__all__ = ["asof_join", "topk_per_group"]
