"""Structured Streaming surface.

Scoping note (SURVEY.md section 0 / 2.10): the reference's "streaming"
is batch pipelining (chunked operators with is_last flags) -- Spark's
ordinary execution subsumes it, and the reference has NO event-time
semantics (no watermarks/session windows) to reach parity with. This
module therefore goes beyond the reference: real Structured Streaming
wrappers (file/rate sources, watermarked tumbling/sliding windows,
stateful sessionization via applyInPandasWithState) so stream-shaped
workloads run on the same engine.
"""

from .ann import (  # noqa: F401
    stream_ivf_pq_topk,
)
from .cdc import (  # noqa: F401
    apply_cdc_stream,
    maintain_rollup_stream,
)
from .retrieval import (  # noqa: F401
    stream_bm25_topk,
)
from .dedup import (  # noqa: F401
    stream_bloom_new_rows,
    stream_decontaminate_new_rows,
    stream_drop_boilerplate_lines,
    stream_excise_spans,
    stream_minhash_flags,
    stream_semantic_new_rows,
)
from .joins import (  # noqa: F401
    stream_stream_interval_join,
)
from .stateful import (  # noqa: F401
    dedup_stream,
    funnel_stream_stateful,
    running_totals_stateful,
)
from .windows import (  # noqa: F401
    read_stream_csv,
    read_stream_json,
    read_stream_parquet,
    read_stream_rate,
    run_available_now,
    sessionize_stateful,
    sliding_agg,
    tumbling_agg,
)
