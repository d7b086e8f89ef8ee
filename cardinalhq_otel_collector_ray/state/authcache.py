"""C9 auth TTL cache — the chqauth server-side lookup state machine.

Transcribes ``extension/chqauthextension/serverauth.go:132-288`` +
``config.go:26-43`` defaults:

- per-entry expiry: valid entries cached 10 min, invalid (denied) entries
  1 min (config.go:42-43),
- ``getcache``: an EXPIRED entry is removed from the cache but returned to
  the caller as a stale-fallback candidate (serverauth.go:138-156),
- a cached un-expired DENIAL short-circuits to denied — no validator call
  (serverauth.go:182-188),
- a definitive denial from the validator is cached under the invalid TTL
  and NEVER falls back to a previously cached valid entry — a revoked key
  must not keep authenticating as its former customer
  (serverauth.go:191-205),
- a TRANSIENT validator failure (network, non-200, parse error) serves the
  expired cache entry when one exists, else propagates
  (serverauth.go:206-218),
- response classification (serverauth.go:240-266): non-200 → transient
  (revocation is signalled as 200+valid:false, so an unhealthy validator
  must not lock collectors out); 200 with valid=false OR empty
  customer_id → denied,
- header extraction: first case-insensitive match among configured header
  names (serverauth.go:279-288; defaults config.go:53-57).

The validator is INJECTABLE (a callable ``key -> AuthData`` raising
``Denied`` / ``Transient``); the batch engine wires a snapshot of this
cache as the broadcast enrichment dictionary (stages/enrich.py) and
long-lived actors call ``refresh`` between runs.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, replace

DEFAULT_TTL_VALID_S = 600.0    # config.go:42
DEFAULT_TTL_INVALID_S = 60.0   # config.go:43
DEFAULT_AUTH_HEADERS = (       # config.go:53-57
    "x-amz-firehose-access-key", "x-cardinalhq-api-key", "dd-api-key")


class Denied(Exception):
    """errDenied: definitive rejection — cacheable, never stale-served."""


class Transient(Exception):
    """errTransient: validator unhealthy — eligible for stale-serve."""


@dataclass(frozen=True)
class AuthData:
    api_key: str
    customer_id: str = ""
    customer_name: str = ""
    valid: bool = False
    expiry: float = 0.0


def classify_response(api_key: str, status: int, body: dict | None) -> AuthData:
    """callValidateAPI's acceptance rules (serverauth.go:240-266)."""
    if status != 200:
        raise Transient(f"auth validator returned status {status}")
    if body is None:
        raise Transient("auth validator response unparsable")
    valid = bool(body.get("valid", False))
    customer_id = body.get("customer_id", "") or ""
    if not valid or customer_id == "":
        # 200+valid:false is a revocation; valid:true with empty
        # customer_id is an upstream contract violation — both DENY
        raise Denied("auth validator denied key")
    return AuthData(api_key=api_key, customer_id=customer_id,
                    customer_name=body.get("customer_name", "") or "",
                    valid=True)


def get_auth_header(headers: dict[str, list[str] | str],
                    targets: tuple[str, ...] = DEFAULT_AUTH_HEADERS) -> str:
    """First case-insensitive match among target names (serverauth.go:279-288)."""
    lowered = {k.lower(): v for k, v in headers.items()}
    for t in targets:
        v = lowered.get(t.lower())
        if v:
            return v[0] if isinstance(v, (list, tuple)) else v
    return ""


class TTLAuthCache:
    """authenticateAPIKey state machine (serverauth.go:181-222).

    ``validator(key) -> AuthData`` (raises Denied / Transient).
    ``clock()`` injectable for deterministic tests.
    """

    def __init__(self, validator, *, ttl_valid_s: float = DEFAULT_TTL_VALID_S,
                 ttl_invalid_s: float = DEFAULT_TTL_INVALID_S, clock=time.monotonic):
        self.validator = validator
        self.ttl_valid_s = ttl_valid_s
        self.ttl_invalid_s = ttl_invalid_s
        self.clock = clock
        self._cache: dict[str, AuthData] = {}
        self.lookups = {"hit": 0, "miss": 0, "expired": 0}
        self.validator_calls = 0

    # getcache (serverauth.go:138-156): expired entries are deleted but
    # RETURNED so a transient validator failure can stale-serve them.
    def _getcache(self, api_key: str) -> tuple[AuthData | None, bool]:
        ad = self._cache.get(api_key)
        if ad is None:
            self.lookups["miss"] += 1
            return None, False
        if ad.expiry < self.clock():
            self.lookups["expired"] += 1
            del self._cache[api_key]
            return ad, True
        self.lookups["hit"] += 1
        return ad, False

    def _setcache(self, ad: AuthData) -> None:
        self._cache[ad.api_key] = ad

    def authenticate(self, api_key: str) -> AuthData:
        cached, expired = self._getcache(api_key)
        if cached is not None and not expired:
            if not cached.valid:
                raise Denied("cached denial")  # serverauth.go:184-187
            return cached
        try:
            ad = self.validator(api_key)
            self.validator_calls += 1
        except Denied:
            self.validator_calls += 1
            self._setcache(AuthData(api_key=api_key, valid=False,
                                    expiry=self.clock() + self.ttl_invalid_s))
            # definitive denial NEVER falls back to the expired entry
            raise
        except Transient:
            self.validator_calls += 1
            if cached is not None:
                # stale-serve to preserve availability (serverauth.go:210-214)
                return cached
            raise
        ad = replace(ad, api_key=api_key,
                     expiry=self.clock() + self.ttl_valid_s)
        self._setcache(ad)
        return ad

    def snapshot(self, keys) -> dict[str, dict]:
        """Authenticate every key and return the broadcast-enrichment dict
        ``{key: {customer_id, customer_name, valid}}`` — denied/unreachable
        keys map to ``valid=False`` (the quarantine routing signal). This
        is the bridge from the TTL cache to ``enrich_stage``'s broadcast
        dictionary (one snapshot per run, refreshed between runs)."""
        out: dict[str, dict] = {}
        for k in keys:
            try:
                ad = self.authenticate(k)
                out[k] = {"customer_id": ad.customer_id,
                          "customer_name": ad.customer_name, "valid": True}
            except (Denied, Transient):
                out[k] = {"customer_id": None, "customer_name": None,
                          "valid": False}
        return out
