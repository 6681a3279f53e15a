from .subscribe import (
    subscribe,
    subscribe_snapshot_then_live,
    subscribe_to_info,
    run_ttl_claim_loop,
    run_index_maintenance_loop,
    streaming_exact_dedup,
    windowed_event_rates,
    stateful_key_activity,
)

__all__ = [
    "subscribe",
    "subscribe_snapshot_then_live",
    "subscribe_to_info",
    "run_ttl_claim_loop",
    "run_index_maintenance_loop",
    "streaming_exact_dedup",
    "windowed_event_rates",
    "stateful_key_activity",
]
