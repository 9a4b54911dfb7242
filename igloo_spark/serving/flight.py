"""Arrow Flight SQL-style serving.

Mirrors the reference's Flight surface (igloo-io/igloo
``crates/api/src/lib.rs:67-184``):

- ``get_flight_info`` (lib.rs:81-99): client sends a FlightDescriptor
  whose ``cmd`` is the SQL bytes; we return the result schema + a
  ticket echoing the SQL. The reference executes the whole query
  eagerly just to learn the schema — a design wart its comments admit;
  we derive the schema from the *analyzed lazy plan* (zero execution).
- ``do_get`` (lib.rs:108-149): ticket = SQL bytes → execute → stream
  Arrow record batches.
- The reference's 7 other RPCs are ``unimplemented`` (lib.rs:67-79,
  101-106,151-184); we inherit FlightServerBase's default NotImplemented
  for exactly the same surface.

Scale posture: this server is a *driver-side* result spout, as in the
reference. Heavy lifting happens on the cluster; ``toArrow`` collects
the (already aggregated/limited) result. For full-table exports use
``df.write`` to distributed storage instead of Flight.
"""

from __future__ import annotations

import re
import threading

import pyarrow as pa
import pyarrow.flight as flight

# Matches one single-quoted SQL string literal, including escaped ''
# quotes inside it ('it''s'); used to split SQL into literal and
# non-literal spans so identifier rewriting never touches string data.
_SQL_LITERAL = re.compile(r"'(?:[^']|'')*'")


def _rewrite_exchange_sql(sql: str, view: str, token: str = "exchange_input") -> str:
    """Replace the ``exchange_input`` placeholder IDENTIFIER with the
    per-call view name — only on word boundaries, and never inside
    single-quoted string literals. A raw ``str.replace`` would mangle
    a client column named ``exchange_input_ts`` and rewrite the token
    inside data literals like ``WHERE tag = 'exchange_input'``."""
    word = re.compile(rf"\b{re.escape(token)}\b")
    out: list[str] = []
    pos = 0
    for m in _SQL_LITERAL.finditer(sql):
        out.append(word.sub(view, sql[pos:m.start()]))
        out.append(m.group(0))  # literal span: untouched
        pos = m.end()
    out.append(word.sub(view, sql[pos:]))
    return "".join(out)


def _spark_to_arrow_schema(df) -> pa.Schema:
    """Result schema from the lazy plan — no execution (improves on the
    reference's execute-to-learn-schema, crates/api/src/lib.rs:86-92)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(df.schema)


class IglooFlightServer(flight.FlightServerBase):
    """Flight server over an IglooSession.

    Protocol (reference parity): descriptor.command = SQL utf-8 bytes;
    ticket = the same SQL bytes.
    """

    def __init__(self, session, location: str = "grpc://127.0.0.1:0") -> None:
        super().__init__(location)
        self.session = session
        self._exchange_lock = threading.Lock()
        self._exchange_seq = 0

    # reference: crates/api/src/lib.rs:81-99
    def get_flight_info(self, context, descriptor):
        sql = descriptor.command.decode("utf-8")
        df = self.session.execute(sql)  # lazy — schema only
        schema = _spark_to_arrow_schema(df)
        ticket = flight.Ticket(sql.encode("utf-8"))
        endpoint = flight.FlightEndpoint(ticket, [f"grpc://127.0.0.1:{self.port}"])
        return flight.FlightInfo(schema, descriptor, [endpoint], -1, -1)

    # reference leaves get_schema unimplemented (crates/api/src/lib.rs:
    # 101-106); ours reuses the lazy-schema path so a client learns the
    # result schema in one RPC without the get_flight_info round trip
    # (and without executing anything — same zero-execution posture).
    def get_schema(self, context, descriptor):
        # a PATH-type descriptor has command=None — reject it as a
        # clean Flight error instead of an internal AttributeError
        if not descriptor.command:
            raise flight.FlightServerError(
                "get_schema requires a command-type descriptor "
                "carrying the SQL text"
            )
        sql = descriptor.command.decode("utf-8")
        df = self.session.execute(sql)  # lazy — schema only
        return flight.SchemaResult(_spark_to_arrow_schema(df))

    # reference leaves poll_flight_info unimplemented too
    # (crates/api/src/lib.rs:183) — the long-running-query polling
    # protocol (Arrow Flight 13.0+). A Spark-lazy query "completes"
    # planning instantly, so the correct PollInfo is the TERMINAL one:
    # the full FlightInfo, no retry descriptor, progress 1.0. pyarrow
    # 16.x ships no PollInfo/poll_flight_info surface (server or
    # client), so the override binds only when the installed pyarrow
    # exposes it — same environment-gate posture as the Iceberg/Avro
    # jars; the logic is live the moment the dependency catches up.
    if hasattr(flight.FlightServerBase, "poll_flight_info"):
        def poll_flight_info(self, context, descriptor):
            info = self.get_flight_info(context, descriptor)
            return flight.PollInfo(
                info, None, 1.0, None
            )

    # reference: crates/api/src/lib.rs:108-149
    def do_get(self, context, ticket):
        sql = ticket.ticket.decode("utf-8")
        tbl = self.session.execute(sql).toArrow()
        return flight.RecordBatchStream(tbl)

    # reference leaves list_flights unimplemented (crates/api/src/lib.rs:67-72);
    # ours advertises every catalog table as a flight whose ticket is a
    # SELECT * over it — catalog discovery for generic Flight clients.
    def list_flights(self, context, criteria):
        for name in sorted(t.name for t in self.session.spark.catalog.listTables()):
            sql = f"SELECT * FROM {name}"
            df = self.session.spark.table(name)
            descriptor = flight.FlightDescriptor.for_command(sql.encode("utf-8"))
            ticket = flight.Ticket(sql.encode("utf-8"))
            endpoint = flight.FlightEndpoint(ticket, [f"grpc://127.0.0.1:{self.port}"])
            yield flight.FlightInfo(
                _spark_to_arrow_schema(df), descriptor, [endpoint], -1, -1
            )

    # reference leaves do_put unimplemented (crates/api/src/lib.rs:151-156);
    # we accept an upload and register it as a queryable table — the
    # natural inverse of do_get. descriptor.path[0] = table name.
    def do_put(self, context, descriptor, reader, writer):
        name = descriptor.path[0].decode("utf-8")
        tbl = reader.read_all()
        # Arrow table straight into Spark (PySpark 4 accepts pa.Table):
        # a pandas hop would turn nullable ints into float64 and mangle
        # timestamp precision/tz, so the registered schema would no
        # longer match what the client uploaded.
        df = self.session.spark.createDataFrame(tbl)
        self.session.register_table(name, df)

    # reference leaves do_action/list_actions unimplemented
    # (crates/api/src/lib.rs:158-170); we provide the operational
    # surface a serving deployment actually needs: liveness, version,
    # cache invalidation (the roadmap story A10 serves), and explain.
    def do_action(self, context, action):
        import json as _json

        handlers = {
            "health": lambda body: {
                "status": "ok",
                "tables": len(self.session.table_names()),
            },
            "version": lambda body: {
                "engine": "igloo-spark",
                "spark": self.session.spark.version,
            },
            "invalidate_cache": lambda body: {
                "invalidated": (
                    self.session.cache.invalidate(body)
                    if body
                    else (self.session.cache.clear() or True)
                )
            },
            "explain": lambda body: {"plan": self.session.explain(body)},
        }
        if action.type not in handlers:
            raise flight.FlightServerError(f"unknown action {action.type!r}")
        body = action.body.to_pybytes().decode("utf-8") if action.body else ""
        yield flight.Result(_json.dumps(handlers[action.type](body)).encode("utf-8"))

    # reference leaves do_exchange unimplemented (crates/api/src/lib.rs:
    # 172-177); ours is the transform round trip a serving deployment
    # wants for small client-side frames: the client streams a table
    # UP, the SQL in the descriptor transforms it (referencing it as
    # ``exchange_input``), and the result streams BACK on the same
    # call — no persistent registration, no second RPC. Each exchange
    # gets a unique temp-view name (the SQL's ``exchange_input`` token
    # is rewritten), so concurrent exchanges never clobber each other;
    # the view is dropped before returning.
    def do_exchange(self, context, descriptor, reader, writer):
        sql = descriptor.command.decode("utf-8")
        with self._exchange_lock:
            self._exchange_seq += 1
            view = f"_igloo_exchange_{self._exchange_seq}"
        tbl = reader.read_all()
        df_in = self.session.spark.createDataFrame(tbl)
        df_in.createOrReplaceTempView(view)
        try:
            out = self.session.execute(
                _rewrite_exchange_sql(sql, view)
            ).toArrow()
        finally:
            self.session.spark.catalog.dropTempView(view)
        writer.begin(out.schema)
        writer.write_table(out)

    def list_actions(self, context):
        return [
            flight.ActionType("health", "liveness + registered table count"),
            flight.ActionType("version", "engine + spark versions"),
            flight.ActionType(
                "invalidate_cache",
                "drop one cached plan (body=key) or all (empty body)",
            ),
            flight.ActionType("explain", "optimized plan text for the SQL in the body"),
        ]


def serve_in_background(session, port: int = 0) -> tuple[IglooFlightServer, threading.Thread]:
    """Start a Flight server on a daemon thread; returns (server, thread).
    ``server.port`` holds the bound port (0 → ephemeral)."""
    server = IglooFlightServer(session, f"grpc://127.0.0.1:{port}")
    thread = threading.Thread(target=server.serve, daemon=True)
    thread.start()
    return server, thread


def _connect(port: int, timeout_s: float = 15.0) -> flight.FlightClient:
    """Client connect that tolerates the serve_in_background startup
    race: gRPC connects lazily, so the first RPC can hit the server
    thread before it binds — wait for availability with a bounded
    retry instead of surfacing FlightUnavailableError to callers."""
    client = flight.connect(f"grpc://127.0.0.1:{port}")
    client.wait_for_available(timeout=int(timeout_s))
    return client


def upload_via_flight(port: int, name: str, tbl: pa.Table) -> None:
    """Client helper: do_put an Arrow table under a table name, making
    it queryable via subsequent Flight SQL calls."""
    client = _connect(port)
    descriptor = flight.FlightDescriptor.for_path(name.encode("utf-8"))
    writer, _ = client.do_put(descriptor, tbl.schema)
    writer.write_table(tbl)
    writer.close()


def query_via_flight(port: int, sql: str) -> pa.Table:
    """Client helper: the two-step get_flight_info → do_get round trip
    the reference's README demonstrates (crates/client is an empty stub
    there; this supersedes it)."""
    client = _connect(port)
    info = client.get_flight_info(flight.FlightDescriptor.for_command(sql.encode("utf-8")))
    reader = client.do_get(info.endpoints[0].ticket)
    return reader.read_all()


def exchange_via_flight(port: int, sql: str, tbl: pa.Table) -> pa.Table:
    """Client helper: one-call transform round trip — upload ``tbl``,
    run ``sql`` over it (reference it as ``exchange_input``), read the
    transformed stream back."""
    client = _connect(port)
    descriptor = flight.FlightDescriptor.for_command(sql.encode("utf-8"))
    writer, reader = client.do_exchange(descriptor)
    writer.begin(tbl.schema)
    writer.write_table(tbl)
    writer.done_writing()
    out = reader.read_all()
    writer.close()
    return out


def action_via_flight(port: int, name: str, body: str = "") -> dict:
    """Client helper: invoke a server action, decode the JSON result."""
    import json as _json

    client = flight.connect(f"grpc://127.0.0.1:{port}")
    results = list(client.do_action(flight.Action(name, body.encode("utf-8"))))
    return _json.loads(results[0].body.to_pybytes().decode("utf-8"))
