"""REST transform-serving parity (reference:
CSVSparkTransformServer.java:66-189 / CSVSparkTransformServerNoJsonTest):
set a TransformProcess spec and input schema over HTTP, transform single
records and batches, and get schema propagation + client/server errors
back. Each test POSTs the spec/schema it depends on (self-contained —
round-5 advice: no ordering between tests)."""

import json
import urllib.request
from urllib.error import HTTPError

import pytest

from datavec_spark.operators.transforms import TransformProcess
from datavec_spark.serving import RestTransformServer


def _call(port, path, payload=None, method=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


@pytest.fixture(scope="module")
def server(spark):
    srv = RestTransformServer(spark).start()
    yield srv
    srv.stop()


def _post_upper_times2(server):
    """The shared spec under test: uppercase `name`, double `x`."""
    tp = TransformProcess().add("change_case", column="name", mode="upper") \
                           .add("math_op", column="x", math_op="Multiply", scalar=2.0)
    assert _call(server.port, "/schema", {"ddl": "name string, x double"})["ok"]
    r = _call(server.port, "/transformprocess", json.loads(tp.to_json()))
    assert r == {"ok": True, "steps": 2}


def test_set_and_get_process_and_schema(server):
    _post_upper_times2(server)
    assert _call(server.port, "/transformprocess")["steps"][0]["op"] == "change_case"
    assert _call(server.port, "/schema")["ddl"] == "name string, x double"


def test_transform_single_and_batch(server):
    _post_upper_times2(server)
    out = _call(server.port, "/transform", {"record": {"name": "ada", "x": 3.0}})
    assert out["record"] == {"name": "ADA", "x": 6.0}
    assert ["name", "string"] in out["schema"]
    batch = _call(server.port, "/transformincremental",
                  {"records": [{"name": "a", "x": 1.0}, {"name": "b", "x": 2.5}]})
    assert [r["x"] for r in batch["records"]] == [2.0, 5.0]
    assert [r["name"] for r in batch["records"]] == ["A", "B"]


def test_schema_propagation_after_spec_change(server):
    _post_upper_times2(server)
    tp = TransformProcess().add("remove_columns", columns=["x"]) \
                           .add("add_constant", column="tag", value="served", col_type="string")
    _call(server.port, "/transformprocess", json.loads(tp.to_json()))
    out = _call(server.port, "/transform", {"record": {"name": "n1", "x": 9.0}})
    assert out["record"] == {"name": "n1", "tag": "served"}
    assert dict(map(tuple, out["schema"])) == {"name": "string", "tag": "string"}


def test_client_errors(server):
    _post_upper_times2(server)
    with pytest.raises(HTTPError) as e:
        _call(server.port, "/transformprocess",
              {"steps": [{"op": "definitely_not_an_op"}]})
    assert e.value.code == 400
    with pytest.raises(HTTPError) as e:
        _call(server.port, "/nope", {})
    assert e.value.code == 404


def test_oversized_body_rejected(server):
    """A hostile Content-Length must be refused before the body is read
    into memory (400, not an OOM)."""
    from datavec_spark.serving.rest import MAX_BODY_BYTES

    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/transform", data=b"{}",
        headers={"Content-Type": "application/json",
                 "Content-Length": str(MAX_BODY_BYTES + 1)})
    with pytest.raises(HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_server_error_is_500_not_400(server):
    """A transform that explodes INSIDE execution (not a bad spec) is a
    server fault: 500. Regression pin for the catch-all that mapped every
    exception to 400."""
    _post_upper_times2(server)
    # missing input schema is a client fault -> 400
    srv2 = RestTransformServer(server.spark).start()
    try:
        with pytest.raises(HTTPError) as e:
            _call(srv2.port, "/transform", {"record": {"name": "x"}})
        assert e.value.code == 400  # ValueError: schema not set
        # a dead/broken Spark path is a server fault -> 500: simulate by
        # making apply_records raise a non-client exception type
        srv2.ddl = "name string"
        orig = srv2.apply_records
        srv2.apply_records = lambda records: (_ for _ in ()).throw(
            RuntimeError("executor lost"))
        with pytest.raises(HTTPError) as e:
            _call(srv2.port, "/transform", {"record": {"name": "x"}})
        assert e.value.code == 500
        srv2.apply_records = orig
    finally:
        srv2.stop()
