from . import relational  # noqa: F401
from .registry import QUERIES, QuerySpec  # noqa: F401
