"""Catalog / ConfiguredCatalog model (reference:
pkg/airbyte/types.go:25-55 — Stream, ConfiguredStream, Catalog,
ConfiguredCatalog; sync modes types.go:6-23).

A Catalog lists every stream a source offers; a ConfiguredCatalog is
the user-selected subset with sync mode, cursor and destination mode
— the engine's unit of planning for a ``read``.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field

from go_integ_spark.schema.stream import StreamSchema


class SyncMode(enum.Enum):
    # reference: pkg/airbyte/types.go:6-13
    FULL_REFRESH = "full_refresh"
    INCREMENTAL = "incremental"


class DestinationSyncMode(enum.Enum):
    # reference: pkg/airbyte/types.go:15-23
    APPEND = "append"
    OVERWRITE = "overwrite"


@dataclass
class CatalogStream:
    """Airbyte catalog entry (pkg/airbyte/types.go:32-40)."""

    schema: StreamSchema

    def to_airbyte(self) -> dict:
        modes = ["full_refresh"]
        if self.schema.incremental:
            modes.append("incremental")
        d = {
            "name": self.schema.name,
            "json_schema": self.schema.json_schema(),
            "supported_sync_modes": modes,
        }
        if self.schema.cursor_field():
            d["default_cursor_field"] = [self.schema.cursor_field()]
        if self.schema.primary_key:
            d["source_defined_primary_key"] = [[f.path] for f in self.schema.primary_key]
        if self.schema.namespace:
            d["namespace"] = self.schema.namespace
        return d


@dataclass
class Catalog:
    streams: list[CatalogStream] = field(default_factory=list)

    def to_airbyte(self) -> dict:
        return {"streams": [s.to_airbyte() for s in self.streams]}

    def names(self) -> list[str]:
        return [s.schema.name for s in self.streams]


@dataclass
class ConfiguredStream:
    # reference: pkg/airbyte/types.go:42-49
    schema: StreamSchema
    sync_mode: SyncMode = SyncMode.FULL_REFRESH
    destination_sync_mode: DestinationSyncMode = DestinationSyncMode.APPEND
    cursor_field: list[str] = field(default_factory=list)


@dataclass
class ConfiguredCatalog:
    # reference: pkg/airbyte/types.go:51-55
    streams: list[ConfiguredStream] = field(default_factory=list)

    def selected_names(self) -> set[str]:
        return {s.schema.name for s in self.streams}
