"""C8 notifier behavior table — transcribed from the reference's
``exporter/awss3exporter/internal/notify/notifier_test.go:181-619`` and
``config.go`` validation table. Pure threading tests, no Ray."""

import threading
import time
import urllib.parse

import pytest

from cardinalhq_otel_collector_ray.state.notifier import (
    REASON_PERMANENT_4XX, REASON_QUEUE_FULL, REASON_RETRIES_EXHAUSTED,
    REASON_SHUTDOWN, STATUS_2XX, STATUS_5XX, Event, HttpNotifier,
    NoopNotifier, NotifyConfig, build, marshal_batch)


def _cfg(**kw):
    base = dict(endpoint="http://example.test/hook", initial_backoff_s=0.001,
                max_backoff_s=0.01)
    base.update(kw)
    return NotifyConfig(**base)


class RecordingTransport:
    """Injectable transport: scripted status codes (or exceptions), records
    every POST body."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = []
        self.lock = threading.Lock()

    def __call__(self, body: bytes) -> int:
        with self.lock:
            self.calls.append(body)
            r = self.script.pop(0) if self.script else 200
        if isinstance(r, Exception):
            raise r
        return r


def _wait(pred, timeout=5.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.005)
    return False


def test_happy_path_single_batch_sent():
    tr = RecordingTransport([200])
    n = HttpNotifier(_cfg(), tr, rand=lambda: 0.5)
    assert n.enqueue(Event("b", "k1", 10)) is True
    assert _wait(lambda: n.metrics.sent == 1)
    n.shutdown()
    assert n.metrics.dropped == {}
    assert len(tr.calls) == 1


def test_batching_caps_at_max_records_per_post():
    """notifier_test.go batching case: 250 events → every POST carries ≤100
    records and all 250 are delivered."""
    tr = RecordingTransport([200] * 50)
    n = HttpNotifier(_cfg(workers=1), tr, rand=lambda: 0.5)
    for i in range(250):
        assert n.enqueue(Event("b", f"k{i}", i))
    n.shutdown()
    assert n.metrics.sent == 250 and n.metrics.dropped == {}
    import json
    sizes = [len(json.loads(c)["Records"]) for c in tr.calls]
    assert max(sizes) <= 100 and sum(sizes) == 250


def test_retry_then_succeed_on_5xx():
    tr = RecordingTransport([503, 200])
    n = HttpNotifier(_cfg(workers=1), tr, rand=lambda: 0.5)
    n.enqueue(Event("b", "k", 1))
    assert _wait(lambda: n.metrics.sent == 1)
    n.shutdown()
    assert len(tr.calls) == 2
    classes = [c for c, _ in n.metrics.durations]
    assert classes == [STATUS_5XX, STATUS_2XX]


def test_retries_exhausted_drops_batch():
    tr = RecordingTransport([500, 500, 500])
    n = HttpNotifier(_cfg(workers=1, max_attempts=3), tr, rand=lambda: 0.5)
    n.enqueue(Event("b", "k", 1))
    assert _wait(lambda: n.metrics.dropped.get(REASON_RETRIES_EXHAUSTED) == 1)
    n.shutdown()
    assert len(tr.calls) == 3  # exactly max_attempts, then gave up
    assert n.metrics.sent == 0


def test_permanent_4xx_never_retried():
    tr = RecordingTransport([404])
    n = HttpNotifier(_cfg(workers=1), tr, rand=lambda: 0.5)
    n.enqueue(Event("b", "k", 1))
    assert _wait(lambda: n.metrics.dropped.get(REASON_PERMANENT_4XX) == 1)
    n.shutdown()
    assert len(tr.calls) == 1  # one attempt only


def test_network_error_is_retriable():
    tr = RecordingTransport([ConnectionError("boom"), 200])
    n = HttpNotifier(_cfg(workers=1), tr, rand=lambda: 0.5)
    n.enqueue(Event("b", "k", 1))
    assert _wait(lambda: n.metrics.sent == 1)
    n.shutdown()
    assert len(tr.calls) == 2


def test_queue_full_drops_nonblocking():
    """Enqueue never blocks: with a size-1 queue and a stalled worker, the
    overflow event is dropped with reason queue_full and enqueue returns
    False immediately (notifier.go:168-174)."""
    gate = threading.Event()

    def stalled(body):
        gate.wait(5)
        return 200
    n = HttpNotifier(_cfg(queue_size=1, workers=1), stalled, rand=lambda: 0.5)
    n.enqueue(Event("b", "k0", 0))          # worker picks this up and stalls
    _wait(lambda: n._q.empty())
    n.enqueue(Event("b", "k1", 1))          # sits in the queue
    accepted = n.enqueue(Event("b", "k2", 2))
    assert accepted is False
    assert n.metrics.dropped.get(REASON_QUEUE_FULL) == 1
    gate.set()
    n.shutdown()


def test_shutdown_drains_queued_events():
    tr = RecordingTransport([200] * 10)
    n = HttpNotifier(_cfg(workers=2), tr, rand=lambda: 0.5)
    for i in range(30):
        n.enqueue(Event("b", f"k{i}", i))
    n.shutdown()  # no deadline → full drain
    assert n.metrics.sent == 30
    assert n.metrics.dropped == {}


def test_enqueue_after_shutdown_is_shutdown_drop():
    tr = RecordingTransport([200])
    n = HttpNotifier(_cfg(), tr, rand=lambda: 0.5)
    n.shutdown()
    assert n.enqueue(Event("b", "k", 1)) is False
    assert n.metrics.dropped.get(REASON_SHUTDOWN) == 1


def test_shutdown_deadline_counts_leftovers_as_shutdown_drops():
    """Deadline clips the drain: in-flight/queued events become shutdown
    drops, never phantom retries_exhausted (notifier.go:333-340)."""
    gate = threading.Event()

    def stalled(body):
        gate.wait(5)
        return 500
    n = HttpNotifier(_cfg(queue_size=100, workers=1), stalled, rand=lambda: 0.5)
    for i in range(10):
        n.enqueue(Event("b", f"k{i}", i))
    n.shutdown(deadline_s=0.05)
    gate.set()
    total_dropped = sum(n.metrics.dropped.values())
    assert n.metrics.dropped.get(REASON_RETRIES_EXHAUSTED) is None
    assert total_dropped == 10 and set(n.metrics.dropped) == {REASON_SHUTDOWN}


def test_shutdown_idempotent():
    tr = RecordingTransport([])
    n = HttpNotifier(_cfg(), tr, rand=lambda: 0.5)
    n.shutdown()
    n.shutdown()  # second call short-circuits (notifier.go:186-188)


def test_payload_is_s3_event_shape_with_urlencoded_key():
    body = marshal_batch([Event("my-bucket", "a path/with?chars", 42)],
                         "2024-01-24T06:40:00Z")
    import json
    rec = json.loads(body)["Records"][0]
    assert rec["eventSource"] == "aws:s3"
    assert rec["eventName"] == "ObjectCreated:Put"
    assert rec["eventTime"] == "2024-01-24T06:40:00Z"
    assert rec["s3"]["bucket"]["name"] == "my-bucket"
    assert rec["s3"]["object"]["key"] == urllib.parse.quote_plus("a path/with?chars")
    assert rec["s3"]["object"]["size"] == 42


def test_backoff_doubles_capped_with_jitter_bounds():
    tr = RecordingTransport([])
    n = HttpNotifier(_cfg(initial_backoff_s=1.0, max_backoff_s=30.0),
                     tr, rand=lambda: 0.0)  # jitter factor exactly 0.5
    assert n._backoff(0) == 0.5      # 1 * 0.5
    assert n._backoff(1) == 1.0      # 2 * 0.5
    assert n._backoff(10) == 15.0    # capped at 30 * 0.5
    n2 = HttpNotifier(_cfg(initial_backoff_s=1.0, max_backoff_s=30.0),
                      tr, rand=lambda: 0.999)
    assert abs(n2._backoff(0) - 1.499) < 1e-9
    n.shutdown(); n2.shutdown()


def test_factory_empty_endpoint_is_noop():
    noop = build(NotifyConfig(endpoint=""))
    assert isinstance(noop, NoopNotifier)
    assert noop.enqueue(Event("b", "k", 1)) is False  # notifier.go:59


@pytest.mark.parametrize("bad,msg", [
    (dict(endpoint="not-a-url"), "must be http(s) URL"),
    (dict(endpoint="http://"), "must be http(s) URL"),
    (dict(headers={"Content-Type": "x"}), "Content-Type"),
    (dict(headers={"content-encoding": "x"}), "Content-Encoding"),
    (dict(compression="gzip"), "compression is not supported"),
    (dict(queue_size=0), "queue_size must be >= 1"),
    (dict(workers=0), "workers must be >= 1"),
    (dict(max_records_per_post=0), "max_records_per_post must be >= 1"),
    (dict(max_attempts=0), "max_attempts must be >= 1"),
    (dict(initial_backoff_s=0), "initial_backoff must be > 0"),
    (dict(initial_backoff_s=5.0, max_backoff_s=1.0), "max_backoff must be >="),
])
def test_config_validation_table(bad, msg):
    cfg = _cfg(**bad)
    errs = cfg.validate()
    assert any(msg in e for e in errs), errs


def test_config_empty_endpoint_dormant():
    assert NotifyConfig(endpoint="", queue_size=0).validate() == []


def test_sink_enqueues_notify_event_after_write(tmp_path, ray_session):
    """Upload-then-notify ordering (writer_test.go:366): every recorded
    ManifestEntry produces exactly one notify event with the object path
    and byte size."""
    import pyarrow as pa
    import ray.data
    from cardinalhq_otel_collector_ray.sinks.partitioned import PartitionedSink

    class CaptureNotifier:
        def __init__(self):
            self.events = []

        def enqueue(self, e):
            self.events.append(e)
            return True

        def shutdown(self, deadline_s=None):
            pass

    cap = CaptureNotifier()
    sink = PartitionedSink(str(tmp_path / "out"), run_ts=1706078400.0,
                           num_partitions=2, notifier=cap)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": ["a", "b", "c", "d"], "route": ["main"] * 4,
        "n": [1, 2, 3, 4]}))
    entries = sink.write(ds, key_col="doc_id", resume=False)
    assert len(entries) >= 1
    assert len(cap.events) == len(entries)
    by_key = {e.key: e for e in cap.events}
    for ent in entries:
        assert ent.path in by_key
        assert by_key[ent.path].size == ent.bytes
        assert by_key[ent.path].bucket == sink.root


# ---------------------------------------------------------------- live e2e
class _Hook:
    """Tiny localhost webhook receiver — the httptest.NewServer analog of
    ``internal/upload/writer_test.go:42-90``."""

    def __init__(self, status=200):
        import http.server
        import json
        hook = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                body = self.rfile.read(int(self.headers["Content-Length"]))
                hook.posts.append(
                    (self.path, dict(self.headers), json.loads(body)))
                self.send_response(hook.status)
                self.end_headers()

            def log_message(self, *a):
                pass

        self.posts = []
        self.status = status
        self.server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.url = f"http://127.0.0.1:{self.server.server_address[1]}/hook"
        self.thread = threading.Thread(target=self.server.serve_forever,
                                       daemon=True)
        self.thread.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


def test_live_upload_then_notify_roundtrip(ray_session, tmp_path):
    """End-to-end over a REAL localhost socket with the DEFAULT urllib
    transport (writer_test.go:42-90 analog): sink write → manifest record
    → notifier POST; the webhook receives the S3-event envelope with the
    URL-encoded object key, size, and the configured extra header."""
    import pyarrow as pa
    import ray.data
    from cardinalhq_otel_collector_ray.sinks.partitioned import PartitionedSink

    hook = _Hook()
    try:
        n = build(NotifyConfig(endpoint=hook.url,
                               headers={"X-Run": "r5"},
                               initial_backoff_s=0.001, max_backoff_s=0.01))
        sink = PartitionedSink(str(tmp_path / "out"), run_ts=1706078400.0,
                               num_partitions=2, notifier=n)
        ds = ray.data.from_arrow(pa.table({
            "doc_id": ["a", "b", "c", "d"], "route": ["main"] * 4,
            "n": [1, 2, 3, 4]}))
        entries = sink.write(ds, key_col="doc_id", resume=False)
        assert entries
        n.shutdown(deadline_s=5.0)
        assert n.metrics.sent == len(entries)
        got = {}
        for _path, headers, body in hook.posts:
            assert headers.get("Content-Type") == "application/json"
            assert headers.get("X-Run") == "r5"
            for r in body["Records"]:
                assert r["eventSource"] == "aws:s3"
                assert r["eventName"] == "ObjectCreated:Put"
                got[urllib.parse.unquote_plus(r["s3"]["object"]["key"])] = \
                    r["s3"]["object"]["size"]
        assert got == {e.path: e.bytes for e in entries}
    finally:
        hook.close()


def test_live_transport_4xx_is_permanent_drop():
    """The default transport RETURNS HTTP error statuses (HTTPError → code)
    so a live 4xx classifies as a permanent drop, never a retry storm."""
    hook = _Hook(status=422)
    try:
        n = build(NotifyConfig(endpoint=hook.url,
                               initial_backoff_s=0.001, max_backoff_s=0.01))
        n.enqueue(Event("b", "k", 1))
        assert _wait(lambda: n.metrics.dropped.get(REASON_PERMANENT_4XX) == 1)
        n.shutdown()
        assert len(hook.posts) == 1  # exactly one attempt, no retries
        assert n.metrics.sent == 0
    finally:
        hook.close()
