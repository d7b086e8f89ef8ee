"""C9 TTL auth cache — cases transcribed from the reference's
``extension/chqauthextension/serverauth_test.go`` (TestGetCache,
TestCallValidateAPI_RejectsInvalidOrEmptyCustomer,
TestAuthenticateAPIKey_{RevokedKeyDoesNotReturnStaleCache,
EmptyCustomerIDIsDenied, TransientErrorFallsBackToCache,
5xxServesStaleCache, 5xxWithNoCacheFails}) and TestGetAuthHeader."""

import pytest

from cardinalhq_otel_collector_ray.state.authcache import (
    AuthData, Denied, TTLAuthCache, Transient, classify_response,
    get_auth_header)


class Clock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t


def _ok(key):
    return AuthData(api_key=key, customer_id="cust-1", customer_name="n",
                    valid=True)


@pytest.mark.parametrize("status,body,expect", [
    (200, {"valid": True, "customer_id": "cust-1", "customer_name": "n"}, "ok"),
    (200, {"valid": True, "customer_id": ""}, "denied"),
    (200, {"valid": False, "customer_id": "cust-1"}, "denied"),
    (200, {"valid": False, "customer_id": ""}, "denied"),
    (403, None, "transient"),   # non-200 = unhealthy validator, not denial
    (503, None, "transient"),
])
def test_classify_response_table(status, body, expect):
    if expect == "ok":
        ad = classify_response("key", status, body)
        assert ad.customer_id == "cust-1" and ad.valid
    elif expect == "denied":
        with pytest.raises(Denied):
            classify_response("key", status, body)
    else:
        with pytest.raises(Transient):
            classify_response("key", status, body)


def test_getcache_expired_entry_removed_but_returned():
    """TestGetCache: an expired entry is deleted from the cache yet handed
    back as the stale-fallback candidate."""
    clock = Clock()
    c = TTLAuthCache(lambda k: _ok(k), clock=clock)
    c.authenticate("k")
    assert c.lookups == {"hit": 0, "miss": 1, "expired": 0}
    clock.t += 601  # past valid TTL
    cached, expired = c._getcache("k")
    assert expired and cached is not None and cached.customer_id == "cust-1"
    assert "k" not in c._cache
    assert c.lookups["expired"] == 1


def test_cached_valid_hit_skips_validator():
    clock = Clock()
    c = TTLAuthCache(lambda k: _ok(k), clock=clock)
    c.authenticate("k")
    c.authenticate("k")
    assert c.validator_calls == 1
    assert c.lookups["hit"] == 1


def test_revoked_key_does_not_return_stale_cache():
    """The regression guard (serverauth_test.go:325): once the validator
    denies, the expired valid entry must NOT be served — and the denial is
    cached so subsequent calls don't hit the validator."""
    clock = Clock()
    state = {"deny": False}

    def validator(k):
        if state["deny"]:
            raise Denied("revoked")
        return _ok(k)
    c = TTLAuthCache(validator, clock=clock)
    assert c.authenticate("k").customer_id == "cust-1"
    clock.t += 601          # expire the valid entry
    state["deny"] = True
    with pytest.raises(Denied):
        c.authenticate("k")
    calls = c.validator_calls
    with pytest.raises(Denied):   # cached denial within invalid TTL
        c.authenticate("k")
    assert c.validator_calls == calls  # no extra validator hit


def test_denial_cached_under_invalid_ttl_then_revalidated():
    clock = Clock()
    state = {"deny": True}

    def validator(k):
        if state["deny"]:
            raise Denied("no")
        return _ok(k)
    c = TTLAuthCache(validator, clock=clock)
    with pytest.raises(Denied):
        c.authenticate("k")
    clock.t += 61           # invalid TTL (1 min) expires
    state["deny"] = False
    assert c.authenticate("k").valid  # re-validated after invalid TTL


def test_transient_error_falls_back_to_expired_cache():
    clock = Clock()
    state = {"fail": False}

    def validator(k):
        if state["fail"]:
            raise Transient("503")
        return _ok(k)
    c = TTLAuthCache(validator, clock=clock)
    c.authenticate("k")
    clock.t += 601
    state["fail"] = True
    ad = c.authenticate("k")  # stale-served
    assert ad.customer_id == "cust-1"


def test_transient_with_no_cache_fails():
    def validator(k):
        raise Transient("503")
    c = TTLAuthCache(validator, clock=Clock())
    with pytest.raises(Transient):
        c.authenticate("k")


def test_get_auth_header_case_insensitive_first_match():
    headers = {"DD-API-KEY": ["dd"], "X-CardinalHQ-Api-Key": ["chq"]}
    # first match follows the TARGET order, not the dict order
    assert get_auth_header(headers) == "chq"
    assert get_auth_header({"x-amz-firehose-access-key": "fh",
                            "dd-api-key": "dd"}) == "fh"
    assert get_auth_header({"authorization": "zzz"}) == ""


def test_snapshot_builds_broadcast_dict_with_quarantine_misses():
    def validator(k):
        if k == "bad":
            raise Denied("no")
        if k == "down":
            raise Transient("503")
        return _ok(k)
    c = TTLAuthCache(validator, clock=Clock())
    snap = c.snapshot(["good", "bad", "down"])
    assert snap["good"] == {"customer_id": "cust-1", "customer_name": "n",
                            "valid": True}
    assert snap["bad"]["valid"] is False
    assert snap["down"]["valid"] is False


def test_snapshot_feeds_enrich_stage(ray_session):
    """End-to-end: a TTL-cache snapshot IS the broadcast dict of the
    enrichment stage (C9 wiring)."""
    import pyarrow as pa
    import ray.data
    from cardinalhq_otel_collector_ray.stages.enrich import enrich_stage
    c = TTLAuthCache(lambda k: _ok(k) if k != "bad" else (_ for _ in ()).throw(
        Denied("no")), clock=Clock())
    table = c.snapshot(["a", "bad"])
    ds = ray.data.from_arrow(pa.table({"api_key": ["a", "bad", "a"]}))
    out = enrich_stage(ds, table, "api_key").to_pandas()
    assert list(out["valid"]) == [True, False, True]
    assert list(out["customer_id"]) == ["cust-1", None, "cust-1"]
