from . import vectormath, text  # noqa: F401
