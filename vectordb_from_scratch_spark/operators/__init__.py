from . import ann, crud, dedup, filters, knn, textops  # noqa: F401
