"""Operator surface: reads, mutations, claims, locks, telemetry —
the reference's RPC groups re-expressed over DataFrames."""

from .claims import Cap, patch_expired, shift_expired, shift_matching
from .locks import CasLeaseLockManager, FileLeaseLockManager, LockManager
from .mutate import (
    PatchKind,
    PatchOp,
    delete_treasures,
    increment,
    patch_treasures,
    set_treasures,
    shift_by_keys,
    uint32slice_delete,
    uint32slice_is_value_exist,
    uint32slice_push,
    uint32slice_size,
)
from .read import (
    count,
    count_matching,
    get,
    get_all,
    get_by_index,
    get_by_index_stream,
    get_by_index_stream_from_many,
    get_by_keys,
    keys_exist,
    profile_read,
)
from .telemetry import (
    QueryStatsCollector,
    history,
    rolling_rates,
    slow_queries,
    top_swamps,
)

__all__ = [
    "Cap",
    "CasLeaseLockManager",
    "FileLeaseLockManager",
    "LockManager",
    "PatchKind",
    "PatchOp",
    "QueryStatsCollector",
    "count",
    "count_matching",
    "delete_treasures",
    "get",
    "get_all",
    "get_by_index",
    "get_by_index_stream",
    "get_by_index_stream_from_many",
    "get_by_keys",
    "history",
    "increment",
    "keys_exist",
    "patch_expired",
    "patch_treasures",
    "profile_read",
    "rolling_rates",
    "set_treasures",
    "shift_by_keys",
    "shift_expired",
    "shift_matching",
    "slow_queries",
    "top_swamps",
    "uint32slice_delete",
    "uint32slice_is_value_exist",
    "uint32slice_push",
    "uint32slice_size",
]
