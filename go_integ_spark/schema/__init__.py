from go_integ_spark.schema.stream import Field, StreamSchema, SortOrder
from go_integ_spark.schema.catalog import (
    Catalog,
    ConfiguredCatalog,
    ConfiguredStream,
    DestinationSyncMode,
    SyncMode,
)

__all__ = [
    "Field",
    "StreamSchema",
    "SortOrder",
    "Catalog",
    "ConfiguredCatalog",
    "ConfiguredStream",
    "SyncMode",
    "DestinationSyncMode",
]
