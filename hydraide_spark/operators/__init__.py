from .read import (
    get,
    get_all,
    get_by_keys,
    get_by_index,
    get_by_index_stream,
    get_by_index_stream_from_many,
    profile_read,
    count,
    count_matching,
    keys_exist,
)

__all__ = [
    "get",
    "get_all",
    "get_by_keys",
    "get_by_index",
    "get_by_index_stream",
    "get_by_index_stream_from_many",
    "profile_read",
    "count",
    "count_matching",
    "keys_exist",
]
