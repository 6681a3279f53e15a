from .name import Name, island_id_col, island_id
from .schema import TREASURE_META_COLUMNS, treasure_schema

__all__ = [
    "Name",
    "island_id",
    "island_id_col",
    "TREASURE_META_COLUMNS",
    "treasure_schema",
]
