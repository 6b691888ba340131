"""Example connectors reproducing the five reference integrations as
pure declarations — one per pagination style (SURVEY.md §2.1 S2-S6).

Reference counterparts (for parity checks, not copied):
- pokeapi: next-URL pagination (integrations/pokeapi/poke.go)
- shopify: Link-header pagination + cursor incremental + secret
  header auth + fields= projection (integrations/shopify/shopify.go)
- klaviyo: marker-token pagination + api-key query auth
  (integrations/klaviyo/klaviyo.go)
- storm:   OData nextLink + $select projection + basic auth
  (integrations/storm/storm.go)
- sitoo:   offset/num with short-page termination + basic auth
  (integrations/sitoo/sitoo.go)

Each config needs ``url``; auth keys per connector.
"""

from __future__ import annotations

from go_integ_spark.schema.stream import Field, StreamSchema
from go_integ_spark.sources.http import (
    BasicAuth,
    LinkHeaderPaginator,
    MarkerPaginator,
    NextUrlPaginator,
    ODataPaginator,
    OffsetLimitPaginator,
    QueryApiKey,
)
from go_integ_spark.sources.source import CursorSpec, HttpStream, Projection, Source

# --- pokeapi (poke.go:15-41) ---------------------------------------------
pokeapi = Source(
    name="pokeapi",
    config_json_schema={
        "type": "object",
        "properties": {"url": {"type": "string"}},
        "required": ["url"],
    },
    docs_url="https://pokeapi.co/docs/v2",
    streams=[
        HttpStream(
            schema=StreamSchema.from_ddl("pokemon", "name string, url string").primary(
                Field("name")
            ),
            path="/pokemon",
            record_path="results",
            params={"limit": "100"},  # poke.go:29
            paginator=NextUrlPaginator,
        )
    ],
)


def _shopify_header_auth(config: dict):
    from go_integ_spark.sources.http import HeaderSecret

    return HeaderSecret("X-Shopify-Access-Token", config.get("api_key", ""))


# --- shopify (shopify.go, types.go) --------------------------------------
shopify = Source(
    name="shopify",
    config_json_schema={
        "type": "object",
        "properties": {"url": {"type": "string"}, "api_key": {"type": "string"}},
        "required": ["url", "api_key"],
    },
    streams=[
        HttpStream(
            schema=StreamSchema.from_ddl(
                "users",
                "id long, email string, created_at string, updated_at string, "
                "verified_email boolean, accepts_marketing boolean",
            )
            .primary(Field("id"))
            .iterated_by(Field("updated_at")),
            path="/users.json",
            record_path="users",
            paginator=LinkHeaderPaginator,
            projection=Projection(param="fields"),  # shopify.go:52
            cursor=CursorSpec(
                cursor_field="updated_at",
                min_param="updated_at_min",  # shopify.go:48-53
                max_param="updated_at_max",
            ),
            auth=_shopify_header_auth,
        ),
        HttpStream(
            schema=StreamSchema.from_ddl(
                "orders", "id string, price double, updated_at string"
            )
            .primary(Field("id"))
            .iterated_by(Field("updated_at")),
            path="/orders.json",
            record_path="orders",
            paginator=LinkHeaderPaginator,
            projection=Projection(param="fields"),
            cursor=CursorSpec(
                cursor_field="updated_at",
                min_param="updated_at_min",
                max_param="updated_at_max",
            ),
            auth=_shopify_header_auth,
        ),
    ],
)


def _klaviyo_auth(config: dict):
    return QueryApiKey("api_key", config.get("api_key", ""))  # klaviyo.go:32


# --- klaviyo (klaviyo.go) -------------------------------------------------
klaviyo = Source(
    name="klaviyo",
    config_json_schema={
        "type": "object",
        "properties": {"url": {"type": "string"}, "api_key": {"type": "string"}},
        "required": ["url", "api_key"],
    },
    streams=[
        HttpStream(
            schema=StreamSchema.from_ddl("members", "id string, email string"),
            path="/members",
            record_path="records",  # klaviyo.go:38
            paginator=MarkerPaginator,  # klaviyo.go:36-44
            projection=Projection(param="fields"),  # klaviyo.go:33
            auth=_klaviyo_auth,
        )
    ],
)


def _storm_auth(config: dict):
    return BasicAuth(config.get("user", ""), config.get("password", ""))


# --- storm (storm.go, types.go) — OData ----------------------------------
storm = Source(
    name="storm",
    config_json_schema={
        "type": "object",
        "properties": {
            "url": {"type": "string"},
            "user": {"type": "string"},
            "password": {"type": "string"},
        },
        "required": ["url"],
    },
    streams=[
        HttpStream(
            schema=StreamSchema.from_ddl(
                "orders", "Id long, OrderNo double, OrderDate string"
            ).primary(Field("Id")),
            path="/Orders",
            record_path="value",  # storm.go:58
            paginator=ODataPaginator,  # storm.go:57-65
            projection=Projection(param="$select"),  # storm.go:47
            auth=_storm_auth,
        ),
        HttpStream(
            schema=StreamSchema.from_ddl(
                "users", "Id long, Key string, EmailAddress string, IsActive boolean"
            ).primary(Field("Id")),
            path="/Users",
            record_path="value",
            paginator=ODataPaginator,
            projection=Projection(param="$select"),
            auth=_storm_auth,
        ),
    ],
)


def _sitoo_auth(config: dict):
    return BasicAuth(config.get("user", ""), config.get("password", ""))


def _sitoo_paginator():
    return OffsetLimitPaginator(offset_param="start", limit_param="num", page_size=10)


# --- sitoo (sitoo.go) -----------------------------------------------------
sitoo = Source(
    name="sitoo",
    config_json_schema={
        "type": "object",
        "properties": {
            "url": {"type": "string"},
            "user": {"type": "string"},
            "password": {"type": "string"},
        },
        "required": ["url"],
    },
    streams=[
        HttpStream(
            schema=StreamSchema.from_ddl(
                "users", "userid string, email string, company string"
            ),
            path="/users.json",
            record_path="items",
            paginator=_sitoo_paginator,  # sitoo.go:56-62
            projection=Projection(param="fields"),  # sitoo.go:51
            auth=_sitoo_auth,
        ),
        HttpStream(
            schema=StreamSchema.from_ddl("orders", "orderid long, email string"),
            path="/orders.json",
            record_path="items",
            paginator=_sitoo_paginator,
            projection=Projection(param="fields"),
            auth=_sitoo_auth,
        ),
    ],
)

ALL_SOURCES = {s.name: s for s in (pokeapi, shopify, klaviyo, storm, sitoo)}
