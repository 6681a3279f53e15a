from .ann_stream import (
    ivf_query_persisted,
    persisted_cells,
    run_ivf_ingest_loop,
)
from .dedup_stream import ingested_pairs, run_neardup_ingest_loop
from .search_stream import (
    bm25_from_state,
    hybrid_search_from_state,
    persisted_doclen,
    persisted_postings,
    run_postings_ingest_loop,
)
from .state_compact import (
    compact_band_epochs,
    compact_epochs,
    compact_hashed_epochs,
    compact_ivf_state,
    compact_neardup_state,
    compact_search_state,
    pending_folded,
    read_nbuckets,
)
from .rollup import rollup_batch, run_rollup_maintenance_loop
from .subscribe import (
    subscribe,
    subscribe_snapshot_then_live,
    subscribe_strict_fifo,
    subscribe_to_info,
    run_ttl_claim_loop,
    run_index_maintenance_loop,
    streaming_exact_dedup,
    windowed_event_rates,
    stateful_key_activity,
)

__all__ = [
    "ivf_query_persisted",
    "persisted_cells",
    "run_ivf_ingest_loop",
    "ingested_pairs",
    "bm25_from_state",
    "hybrid_search_from_state",
    "compact_search_state",
    "persisted_doclen",
    "persisted_postings",
    "run_postings_ingest_loop",
    "compact_band_epochs",
    "compact_epochs",
    "compact_hashed_epochs",
    "pending_folded",
    "read_nbuckets",
    "compact_ivf_state",
    "compact_neardup_state",
    "run_neardup_ingest_loop",
    "rollup_batch",
    "run_rollup_maintenance_loop",
    "subscribe",
    "subscribe_strict_fifo",
    "subscribe_snapshot_then_live",
    "subscribe_to_info",
    "run_ttl_claim_loop",
    "run_index_maintenance_loop",
    "streaming_exact_dedup",
    "windowed_event_rates",
    "stateful_key_activity",
]
