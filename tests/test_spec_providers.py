"""Config-provider resolution (pipelines/providers.py) — the confmap
analog of the reference's provider chain (``distribution/main.go:35-45``:
env/file/http/yaml/s3/secretsmanager). VERDICT r02 item 8."""

import json

import pytest

from cardinalhq_otel_collector_ray.pipelines.providers import (
    deep_merge, register_provider, resolve_config, unregister_provider)
from cardinalhq_otel_collector_ray.pipelines.spec import (
    compile_pipeline, load_spec)


def test_env_bare_and_scheme_and_default(monkeypatch):
    monkeypatch.setenv("GRAFT_SINK_ROOT", "/tmp/out")
    monkeypatch.delenv("GRAFT_MISSING", raising=False)
    assert resolve_config("${GRAFT_SINK_ROOT}") == "/tmp/out"
    assert resolve_config("${env:GRAFT_SINK_ROOT}/part") == "/tmp/out/part"
    assert resolve_config("${env:GRAFT_MISSING:-fallback}") == "fallback"
    assert resolve_config("${env:GRAFT_MISSING:-}") == ""
    with pytest.raises(KeyError, match="GRAFT_MISSING"):
        resolve_config("${env:GRAFT_MISSING}")


def test_env_nested_and_typed(monkeypatch):
    # innermost-first: ${env:${env:WHICH}} and re-resolution of output
    monkeypatch.setenv("WHICH", "TARGET")
    monkeypatch.setenv("TARGET", "42")
    assert resolve_config("${env:${env:WHICH}}") == "42"
    monkeypatch.setenv("CHAIN", "${env:TARGET}")
    assert resolve_config("${CHAIN}") == "42"


def test_yaml_provider_types():
    assert resolve_config("${yaml:[1, 2, 3]}") == [1, 2, 3]
    assert resolve_config("${yaml:true}") is True
    assert resolve_config("pfx-${yaml:7}") == "pfx-7"


def test_file_provider_whole_and_embedded(tmp_path):
    p = tmp_path / "frag.yaml"
    p.write_text("keys: [source]\nvalue: n_tok\n")
    got = resolve_config(f"${{file:{p}}}")
    assert got == {"keys": ["source"], "value": "n_tok"}
    raw = tmp_path / "root.txt"
    raw.write_text("/data/out")
    assert resolve_config(f"${{file:{raw}}}/x") == "/data/out/x"
    with pytest.raises(ValueError, match="embedded"):
        resolve_config(f"root=${{file:{p}}}")


def test_unknown_scheme_and_hook():
    # s3/http/https/aes/secretsmanager are now pre-registered real
    # fetchers (reference chain parity) — googlesecretmanager remains the
    # unregistered hook scheme (OAuth flow is deployment-wired)
    with pytest.raises(ValueError, match="no provider registered"):
        resolve_config("${googlesecretmanager:projects/p/secrets/s}")
    # register_provider OVERRIDES a built-in; restore it afterwards
    from cardinalhq_otel_collector_ray.pipelines import providers as pmod
    builtin = pmod._PROVIDERS["s3"]
    register_provider("s3", lambda sel: {"from": sel})
    try:
        assert resolve_config("${s3:bucket/key.yaml}") == {
            "from": "bucket/key.yaml"}
    finally:
        register_provider("s3", builtin)


def test_escape_literal():
    assert resolve_config("cost is $${env:PRICE}") == "cost is ${env:PRICE}"


def test_bare_env_with_default(monkeypatch):
    """${VAR:-default} without an explicit scheme is the env default form,
    not an unknown provider scheme."""
    monkeypatch.setenv("GRAFT_BARE", "set-value")
    assert resolve_config("${GRAFT_BARE:-fb}") == "set-value"
    monkeypatch.delenv("GRAFT_BARE")
    assert resolve_config("${GRAFT_BARE:-fb}") == "fb"


def test_include_does_not_double_resolve(tmp_path):
    """Escaped $${…} literals in an included base spec must survive the
    include merge: resolution runs exactly once on the merged tree."""
    base = tmp_path / "base.json"
    base.write_text(json.dumps({"cmd": "echo $${env:FOO} literal",
                                "keep": 1}))
    top = tmp_path / "top.json"
    top.write_text(json.dumps({"include": "base.json", "extra": 2}))
    spec = load_spec(str(top))
    assert spec["cmd"] == "echo ${env:FOO} literal"
    assert spec["keep"] == 1 and spec["extra"] == 2


def test_circular_include_rejected(tmp_path):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({"include": "b.json"}))
    b.write_text(json.dumps({"include": "a.json"}))
    with pytest.raises(ValueError, match="circular"):
        load_spec(str(a))


def test_resolve_walks_tree(monkeypatch):
    monkeypatch.setenv("PCT", "10")
    spec = {"stages": [{"kind": "sample", "percent": "${yaml:${env:PCT}}"}],
            "n": 3}
    out = resolve_config(spec)
    assert out["stages"][0]["percent"] == 10  # typed via yaml provider
    assert out["n"] == 3


def test_deep_merge_semantics():
    base = {"source": {"kind": "parquet", "table": "events"},
            "stages": [{"kind": "select", "columns": ["a"]}]}
    over = {"source": {"table": "documents"}, "extra": 1}
    got = deep_merge(base, over)
    assert got["source"] == {"kind": "parquet", "table": "documents"}
    assert got["stages"] == base["stages"]  # lists replace, absent → kept
    assert got["extra"] == 1


def test_load_spec_env_include_end_to_end(tmp_path, monkeypatch, sf_dir):
    """The VERDICT item's done-bar: a spec with an env-substituted value,
    composed via include, loads, resolves and compiles to a runnable
    pipeline."""
    base = tmp_path / "base.json"
    base.write_text(json.dumps({
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id", "text", "source"]},
        "stages": [{"kind": "sample", "id_column": "doc_id",
                    "percent": "${yaml:${env:GRAFT_PCT:-50}}"}],
    }))
    top = tmp_path / "top.json"
    top.write_text(json.dumps({
        "include": "base.json",
        "stages": [{"kind": "sample", "id_column": "doc_id",
                    "percent": "${yaml:${env:GRAFT_PCT:-50}}"},
                   {"kind": "select", "columns": ["doc_id", "${COL}"]}],
    }))
    monkeypatch.setenv("GRAFT_PCT", "100")
    monkeypatch.setenv("COL", "source")
    spec = load_spec(str(top))
    assert "include" not in spec
    assert spec["source"]["table"] == "documents"  # merged from base
    assert spec["stages"][0]["percent"] == 100
    assert spec["stages"][1]["columns"] == ["doc_id", "source"]
    out = compile_pipeline(spec, sf_dir).to_pandas()
    assert list(out.columns) == ["doc_id", "source"]
    assert len(out) > 0

    raw = load_spec(str(top), resolve=False)
    assert raw["stages"][1]["columns"][1] == "${COL}"


def test_http_provider_fetches_real_fragment():
    """REAL http fetcher (urllib) against a local httptest-style server —
    the httpprovider analog from the reference chain
    (distribution/main.go:35-45)."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    body = b"levels: [debug, info]\nlimit: 7\n"

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/frag.yaml":
                self.send_response(200)
                self.send_header("Content-Type", "application/yaml")
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        spec = resolve_config({
            "filters": "${http://127.0.0.1:%d/frag.yaml}" % port,
            "limit": "${http://127.0.0.1:%d/frag.yaml}" % port,
        })
        assert spec["filters"] == {"levels": ["debug", "info"], "limit": 7}
        # a plain scalar splice inside a larger string still raises (maps
        # cannot embed) — the contract matches the file provider
        with pytest.raises(ValueError, match="embedded in a string"):
            resolve_config({"x": "pre ${http://127.0.0.1:%d/frag.yaml}" % port})
    finally:
        srv.shutdown()


def test_fsio_provider_over_object_store_root():
    """The s3-style provider path, exercised over fsio's ``memory://``
    object store (same resolution layer as ``${s3://…}``)."""
    from cardinalhq_otel_collector_ray import fsio
    from cardinalhq_otel_collector_ray.pipelines.providers import (
        fsio_provider, register_provider, unregister_provider)
    fsio.write_bytes_atomic("memory://provider-test/cfg/frag.yaml",
                            b"routes:\n  - main\n  - errors\n")
    register_provider("memory", fsio_provider("memory"))
    try:
        out = resolve_config({"r": "${memory://provider-test/cfg/frag.yaml}"})
        assert out["r"] == {"routes": ["main", "errors"]}
    finally:
        unregister_provider("memory")


def test_unregistered_scheme_still_raises():
    with pytest.raises(ValueError, match="no provider registered"):
        resolve_config({"x": "${googlesecretmanager:projects/p/secrets/s}"})
