"""REST transform serving: apply a TransformProcess JSON spec to records
over HTTP — parity with the reference's transform server
(datavec-spark-inference-server/.../CSVSparkTransformServer.java:66-189:
GET/POST /transformprocess to inspect/set the spec, POST /transform for a
single record, POST /transformincremental for batches), re-expressed on
this engine's spec layer (operators/transforms.py:TransformProcess).

Execution model — deliberately the same as the reference's: the server
holds ONE shared SparkSession and runs each request through the declarative
chain (createDataFrame → chain → collect). That is the right tool for what
this endpoint is FOR (spec validation, schema preview, dev-loop parity
checks, low-QPS enrichment): the chain is arbitrary Catalyst ops, so the
only alternative is reimplementing every op row-at-a-time in Python — the
slow path this repo bans. Bulk inference belongs in the batch/streaming
engine; the docstring-level contract mirrors the reference, which also
spins a local Spark for its single-record endpoint.

stdlib-only (http.server + json): no web framework in the sandbox, none
needed. ThreadingHTTPServer + a lock around Spark actions keeps concurrent
clients safe (Spark sessions are thread-safe for job submission; the lock
serializes spec swaps vs applies).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession

from datavec_spark.operators.transforms import TransformProcess

# accepted request-body ceiling: generous for batch /transformincremental
# payloads, small enough that a hostile Content-Length cannot OOM the server
MAX_BODY_BYTES = 16 * 1024 * 1024


class RestTransformServer:
    """HTTP facade over a TransformProcess.

    Endpoints (reference parity, CSVSparkTransformServer.java:96-187):
      GET  /transformprocess          -> current spec JSON
      POST /transformprocess          <- spec JSON ({"steps": [...]})
      GET  /schema                    -> {"ddl": "..."} input schema
      POST /schema                    <- {"ddl": "col type, ..."}
      POST /transform                 <- {"record": {...}} -> {"record": ...}
      POST /transformincremental      <- {"records": [{...}, ...]}
                                      -> {"records": [...], "schema": [...]}
    A transformed batch reports the OUTPUT schema (name, type) pairs —
    the reference's getSchemaAfterStep analogue rides along free because
    the chain is declarative (Catalyst analysis threads the schema).
    """

    def __init__(self, spark: SparkSession, ddl: str | None = None,
                 process: TransformProcess | None = None,
                 host: str = "127.0.0.1", port: int = 0):
        self.spark = spark
        self.ddl = ddl
        self.process = process or TransformProcess()
        self._lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet for tests
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length", "0"))
                if n > MAX_BODY_BYTES:
                    # refuse before reading: an unbounded read into memory
                    # is a trivial DoS on a serving endpoint
                    raise ValueError(
                        f"request body {n} bytes exceeds cap {MAX_BODY_BYTES}")
                return json.loads(self.rfile.read(n) or b"{}")

            def do_GET(self):
                if self.path == "/transformprocess":
                    self._reply(200, json.loads(server.process.to_json()))
                elif self.path == "/schema":
                    self._reply(200, {"ddl": server.ddl})
                else:
                    self._reply(404, {"error": f"no route {self.path}"})

            def do_POST(self):
                try:
                    body = self._body()
                    if self.path == "/transformprocess":
                        with server._lock:
                            server.process = TransformProcess.from_json(json.dumps(body))
                        self._reply(200, {"ok": True, "steps": len(server.process.steps)})
                    elif self.path == "/schema":
                        with server._lock:
                            server.ddl = body["ddl"]
                        self._reply(200, {"ok": True})
                    elif self.path == "/transform":
                        out = server.apply_records([body["record"]])
                        self._reply(200, {"record": out["records"][0],
                                          "schema": out["schema"]})
                    elif self.path == "/transformincremental":
                        self._reply(200, server.apply_records(body["records"]))
                    else:
                        self._reply(404, {"error": f"no route {self.path}"})
                except (ValueError, KeyError, TypeError,
                        json.JSONDecodeError) as exc:
                    # expected client faults: malformed JSON, missing keys,
                    # bad spec/record/schema, oversized body
                    self._reply(400, {"error": f"{type(exc).__name__}: {exc}"})
                except Exception as exc:  # noqa: BLE001 — genuine server-side
                    # failure (dead SparkSession, internal bug): report as
                    # such, never as a client error (round-5 advice)
                    self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread: threading.Thread | None = None

    # -- core --------------------------------------------------------------

    def apply_records(self, records: list[dict]) -> dict:
        """records (dicts matching the input ddl) -> transformed rows +
        output schema. One tiny local Spark job; the chain itself is the
        same declarative plan the batch engine runs at scale."""
        if not self.ddl:
            raise ValueError("input schema not set (POST /schema first)")
        with self._lock:
            df = self.spark.createDataFrame(
                [tuple(r.get(f.name) for f in self._fields()) for r in records],
                self.ddl,
            )
            out = self.process(df)
            rows = [r.asDict(recursive=True) for r in out.collect()]
            return {"records": rows, "schema": out.dtypes}

    def _fields(self):
        return self.spark.createDataFrame([], self.ddl).schema.fields

    # -- lifecycle -----------------------------------------------------------

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    def start(self) -> "RestTransformServer":
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=5)
