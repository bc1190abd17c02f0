from .ann_stream import (  # noqa: F401
    compact_srp_index,
    ivf_drift,
    ivf_index_stream_foreach_batch,
    ivf_pq_index_stream_foreach_batch,
    ivf_should_rebuild,
    pq_distortion,
    read_ivf_index,
    read_ivf_pq_index,
    read_srp_index,
    srp_index_stream_foreach_batch,
)
from .corpus_stream import corpus_prep_stream_foreach_batch  # noqa: F401
from .counts_stream import (  # noqa: F401
    compact_counts,
    counts_stream_foreach_batch,
    read_counts,
    read_top_hitters,
)
from .dedup_stream import dedup_stream_foreach_batch, read_deduped  # noqa: F401
from .funnel_stream import FUNNEL_STAGES, funnel_stream  # noqa: F401
from .neardup_stream import neardup_stream_foreach_batch, read_survivors  # noqa: F401
from .log_stream import fold_stream_foreach_batch, windowed_event_counts  # noqa: F401
from .scd_stream import scd2_stream_foreach_batch  # noqa: F401
