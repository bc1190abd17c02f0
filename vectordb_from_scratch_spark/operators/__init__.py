from . import (  # noqa: F401
    ann,
    asof,
    crud,
    dedup,
    filters,
    knn,
    metrics,
    multimodal,
    rangejoin,
    skew,
    store,
    textops,
)
