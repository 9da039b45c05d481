from .sharded import make_sharded_search_step  # noqa: F401
