"""Serving layer: Arrow Flight-style server (reference parity with
igloo-io/igloo crates/api) — import-gated so environments without
pyarrow.flight can still use the engine."""

try:
    from igloo_spark.serving.flight import (  # noqa: F401
        IglooFlightServer,
        exchange_via_flight,
        query_via_flight,
        serve_in_background,
        upload_via_flight,
    )
except ImportError:  # pyarrow built without Flight
    IglooFlightServer = None  # type: ignore[assignment]
