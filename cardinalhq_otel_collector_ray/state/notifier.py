"""C8 webhook notifier — the reference's post-upload notification runtime.

Transcribes the state machine of
``exporter/awss3exporter/internal/notify/notifier.go:160-425`` with the
config surface of ``config.go:18-147`` and the payload shape of
``payload.go:57-75``:

- bounded in-memory queue (default 10k) with NON-BLOCKING drop-on-full
  (``Enqueue``, notifier.go:160-175),
- a shared worker pool (default 4) greedy-draining size-triggered batches
  of ≤ max_records_per_post (default 100; no batching timer —
  notifier.go:228-255),
- per-batch retry: ≤ max_attempts (default 3) with exponential backoff
  ``initial * 2^attempt`` capped at max_backoff, jitter sampled fresh per
  attempt in [0.5, 1.5) (notifier.go:416-425),
- outcome classification: 2xx success, 4xx PERMANENT (never retried),
  5xx / network / unexpected-1xx-3xx RETRIABLE (notifier.go:370-409),
- graceful drain on shutdown with a deadline; leftover events and
  deadline-clipped batches are counted as shutdown drops with the exact
  single-reader accounting of notifier.go:181-288,
- per-reason drop counters + sent counter + per-attempt duration samples
  (metrics.go:15-50 analog).

The HTTP transport, clock and jitter source are INJECTABLE — tests
transcribe the behavior table of ``notifier_test.go:181-619`` against a
fake transport; a live deployment passes a real ``urllib``-based poster.
In the Ray engine this is the post-write event path of
``PartitionedSink``: every ManifestEntry recorded on the driver is also
enqueued here (the notify-after-upload rule, exporter.go:117-147).
"""

from __future__ import annotations

import json
import queue
import threading
import urllib.parse
from dataclasses import dataclass, field

# drop reasons (metrics.go:15-50)
REASON_SHUTDOWN = "shutdown"
REASON_QUEUE_FULL = "queue_full"
REASON_PERMANENT_4XX = "permanent_4xx"
REASON_RETRIES_EXHAUSTED = "retries_exhausted"

# status classes (notifier.go:364-369)
STATUS_2XX = "2xx"
STATUS_4XX = "4xx"
STATUS_5XX = "5xx"
STATUS_NETWORK_ERROR = "network_error"


@dataclass(frozen=True)
class Event:
    """The minimum tuple carried from the upload path (notifier.go:30-37).
    ``key`` is stored raw; URL-encoding happens at marshal time."""
    bucket: str
    key: str
    size: int


@dataclass
class NotifyConfig:
    """Config block (config.go:38-80 defaults)."""
    endpoint: str = ""          # empty → feature disabled (noop)
    queue_size: int = 10_000
    workers: int = 4
    max_records_per_post: int = 100
    max_attempts: int = 3
    initial_backoff_s: float = 1.0
    max_backoff_s: float = 30.0
    timeout_s: float = 10.0
    headers: dict[str, str] = field(default_factory=dict)
    compression: str | None = None

    def validate(self) -> list[str]:
        """Invariants of config.go:91-147. Empty endpoint → dormant block,
        no checks. Returns ALL violations (multierr accumulation)."""
        if self.endpoint == "":
            return []
        errs: list[str] = []
        u = urllib.parse.urlparse(self.endpoint)
        if u.scheme not in ("http", "https") or not u.netloc:
            errs.append(f"notifications.endpoint must be http(s) URL: {self.endpoint!r}")
        for name in self.headers:
            if name.lower() == "content-type":
                errs.append("notifications.headers must not override Content-Type")
            if name.lower() == "content-encoding":
                errs.append("notifications.headers must not override Content-Encoding")
        if self.compression not in (None, "", "none"):
            errs.append("notifications.compression is not supported")
        if self.queue_size < 1:
            errs.append("notifications.queue_size must be >= 1")
        if self.workers < 1:
            errs.append("notifications.workers must be >= 1")
        if self.max_records_per_post < 1:
            errs.append("notifications.max_records_per_post must be >= 1")
        if self.max_attempts < 1:
            errs.append("notifications.max_attempts must be >= 1")
        if self.initial_backoff_s <= 0:
            errs.append("notifications.initial_backoff must be > 0")
        if self.max_backoff_s < self.initial_backoff_s:
            errs.append("notifications.max_backoff must be >= initial_backoff")
        return errs


def marshal_batch(events: list[Event], now_rfc3339: str) -> bytes:
    """AWS-S3-event-shaped JSON envelope (payload.go:57-75): Records[] of
    {eventSource: aws:s3, eventName: ObjectCreated:Put, eventTime, s3:
    {bucket.name verbatim, object.key URL-encoded, object.size}}."""
    records = [{
        "eventSource": "aws:s3",
        "eventName": "ObjectCreated:Put",
        "eventTime": now_rfc3339,
        "s3": {
            "bucket": {"name": e.bucket},
            "object": {"key": urllib.parse.quote_plus(e.key),
                       "size": e.size},
        },
    } for e in events]
    return json.dumps({"Records": records}).encode()


class Metrics:
    """Per-reason drop counters, sent counter, per-attempt duration samples
    keyed by status class (metrics.go analog). Thread-safe."""

    def __init__(self):
        self._lock = threading.Lock()
        self.dropped: dict[str, int] = {}
        self.sent = 0
        self.durations: list[tuple[str, float]] = []

    def record_dropped(self, n: int, reason: str) -> None:
        with self._lock:
            self.dropped[reason] = self.dropped.get(reason, 0) + n

    def record_sent(self, n: int) -> None:
        with self._lock:
            self.sent += n

    def record_duration(self, elapsed_s: float, status_class: str) -> None:
        with self._lock:
            self.durations.append((status_class, elapsed_s))


class NoopNotifier:
    """Disabled path (notifier.go:55-67): accepts nothing, does nothing."""

    def enqueue(self, e: Event) -> bool:
        return False

    def shutdown(self, deadline_s: float | None = None) -> None:
        return None


class HttpNotifier:
    """Live notifier: bounded queue, worker pool, size-triggered batching,
    per-batch retry, graceful drain (notifier.go:69-288).

    ``transport(body: bytes) -> int`` returns an HTTP status code or raises
    (raise ≙ network error → retriable). ``rand()`` must return a float in
    [0, 1); ``clock()`` returns the RFC3339 eventTime string.
    """

    def __init__(self, cfg: NotifyConfig, transport, *,
                 rand=None, clock=None, sleep=None):
        errs = cfg.validate()
        if errs:
            raise ValueError("; ".join(errs))
        if not cfg.endpoint:
            raise ValueError("HttpNotifier requires an endpoint; use build()")
        self.cfg = cfg
        self.transport = transport
        self.metrics = Metrics()
        self._rand = rand if rand is not None else __import__("random").random
        self._clock = clock if clock is not None else (
            lambda: "1970-01-01T00:00:00Z")
        self._q: queue.Queue[Event] = queue.Queue(maxsize=cfg.queue_size)
        self._accepting = True
        self._accept_lock = threading.Lock()
        self._stop = threading.Event()        # stopCh
        self._cancel = threading.Event()      # shutdownCtx cancellation
        self._sleep_cancellable = sleep or (
            lambda s: self._cancel.wait(timeout=s))
        self._workers = [threading.Thread(target=self._worker_loop, daemon=True)
                         for _ in range(cfg.workers)]
        for w in self._workers:
            w.start()

    # ---------------------------------------------------------- producer
    def enqueue(self, e: Event) -> bool:
        """Non-blocking (notifier.go:160-175): shutdown → shutdown drop;
        queue full → queue_full drop; else accepted."""
        if not self._accepting:
            self.metrics.record_dropped(1, REASON_SHUTDOWN)
            return False
        try:
            self._q.put_nowait(e)
            return True
        except queue.Full:
            self.metrics.record_dropped(1, REASON_QUEUE_FULL)
            return False

    # ---------------------------------------------------------- shutdown
    def shutdown(self, deadline_s: float | None = None) -> None:
        """Stop accepting, drain within the deadline, count leftovers as
        shutdown drops (notifier.go:181-221). Idempotent."""
        with self._accept_lock:
            if not self._accepting:
                return
            self._accepting = False
        self._stop.set()
        done = threading.Event()

        def waiter():
            for w in self._workers:
                w.join()
            done.set()
        threading.Thread(target=waiter, daemon=True).start()
        if not done.wait(timeout=deadline_s):
            # deadline fired: unblock in-flight retry sleeps / drain loops
            self._cancel.set()
            done.wait()
        # final sweep: no worker reads the queue anymore; exactly one
        # reader per residual event → no double counting (notifier.go:257-264)
        while True:
            try:
                self._q.get_nowait()
                self.metrics.record_dropped(1, REASON_SHUTDOWN)
            except queue.Empty:
                self._cancel.set()
                return

    # ------------------------------------------------------------ worker
    def _pull_batch_nowait(self, first: Event | None) -> list[Event]:
        batch: list[Event] = [] if first is None else [first]
        while len(batch) < self.cfg.max_records_per_post:
            try:
                batch.append(self._q.get_nowait())
            except queue.Empty:
                break
        return batch

    def _worker_loop(self) -> None:
        while True:
            if self._stop.is_set():
                self._drain()
                return
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            self._post_batch(self._pull_batch_nowait(first))

    def _drain(self) -> None:
        """After stop: pull batches non-blockingly until empty, honoring the
        shutdown deadline (notifier.go:265-288). Deadline-clipped batches a
        worker already POPPED are its own shutdown drops."""
        while True:
            batch = self._pull_batch_nowait(None)
            if not batch:
                return
            if self._cancel.is_set():
                self.metrics.record_dropped(len(batch), REASON_SHUTDOWN)
                return
            self._post_batch(batch)

    # ------------------------------------------------------------- retry
    def _backoff(self, attempt: int) -> float:
        """initial * 2^attempt capped at max, jitter in [0.5, 1.5)
        (notifier.go:416-425)."""
        base = self.cfg.initial_backoff_s * (2 ** attempt)
        if base <= 0 or base > self.cfg.max_backoff_s:
            base = self.cfg.max_backoff_s
        return base * (0.5 + self._rand())

    def _do_one_post(self, body: bytes) -> tuple[str, bool, bool]:
        """(status_class, permanent, retriable) — notifier.go:370-409."""
        import time as _time
        start = _time.monotonic()
        try:
            status = self.transport(body)
        except Exception:
            self.metrics.record_duration(_time.monotonic() - start,
                                         STATUS_NETWORK_ERROR)
            return STATUS_NETWORK_ERROR, False, True
        elapsed = _time.monotonic() - start
        if 200 <= status < 300:
            self.metrics.record_duration(elapsed, STATUS_2XX)
            return STATUS_2XX, False, False
        if 400 <= status < 500:
            self.metrics.record_duration(elapsed, STATUS_4XX)
            return STATUS_4XX, True, False
        # 5xx and unexpected 1xx/3xx both bucket to 5xx retriable
        self.metrics.record_duration(elapsed, STATUS_5XX)
        return STATUS_5XX, False, True

    def _post_batch(self, batch: list[Event]) -> None:
        """Outer retry loop; exactly ONE terminal metric event per batch
        (notifier.go:294-358)."""
        body = marshal_batch(batch, self._clock())
        for attempt in range(self.cfg.max_attempts):
            if self._cancel.is_set():
                self.metrics.record_dropped(len(batch), REASON_SHUTDOWN)
                return
            status_class, permanent, retriable = self._do_one_post(body)
            if status_class == STATUS_2XX:
                self.metrics.record_sent(len(batch))
                return
            if permanent:
                self.metrics.record_dropped(len(batch), REASON_PERMANENT_4XX)
                return
            if not retriable:  # defensive; classification is exhaustive
                self.metrics.record_dropped(len(batch), REASON_RETRIES_EXHAUSTED)
                return
            if self._cancel.is_set():
                # shutdown clipped the attempt mid-flight: the drop belongs
                # to shutdown, not retries_exhausted (notifier.go:333-340)
                self.metrics.record_dropped(len(batch), REASON_SHUTDOWN)
                return
            if attempt + 1 == self.cfg.max_attempts:
                self.metrics.record_dropped(len(batch), REASON_RETRIES_EXHAUSTED)
                return
            if self._sleep_cancellable(self._backoff(attempt)):
                # cancelled during the backoff sleep → shutdown drop
                self.metrics.record_dropped(len(batch), REASON_SHUTDOWN)
                return


def urllib_transport(cfg: NotifyConfig):
    """Default live HTTP transport — the stdlib analog of the reference's
    ``http.Client`` POST loop (notifier.go:360-380): POST the JSON body to
    ``cfg.endpoint`` with Content-Type application/json plus the configured
    extra headers, honoring ``cfg.timeout_s``. Returns the HTTP status
    code; network-level failures raise (→ retriable, like Go's
    ``client.Do`` error branch). HTTP error statuses are RETURNED, not
    raised, so 4xx/5xx classify through the normal status table."""
    import urllib.error
    import urllib.request

    def post(body: bytes) -> int:
        req = urllib.request.Request(cfg.endpoint, data=body, method="POST")
        req.add_header("Content-Type", "application/json")
        for k, v in cfg.headers.items():
            req.add_header(k, v)
        try:
            with urllib.request.urlopen(req, timeout=cfg.timeout_s) as resp:
                return int(resp.status)
        except urllib.error.HTTPError as e:
            return int(e.code)  # non-2xx carries a real status
        # URLError / socket.timeout / ConnectionError propagate → network
    return post


def build(cfg: NotifyConfig, transport=None, **kwargs):
    """Factory (notifier.go:104-146): empty endpoint → NoopNotifier;
    otherwise a live HttpNotifier. ``transport`` defaults to the stdlib
    ``urllib_transport`` poster — a deployment needs only the endpoint."""
    if cfg.endpoint == "":
        return NoopNotifier()
    if transport is None:
        transport = urllib_transport(cfg)
    return HttpNotifier(cfg, transport, **kwargs)
