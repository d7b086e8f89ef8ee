"""AWS Signature Version 4 request signing — pure stdlib (hashlib/hmac).

Backs the ``secretsmanager:`` config provider
(``distribution/main.go:18,43``): the sandbox has no AWS SDK, but SigV4
is a published algorithm, so the provider signs its own GetSecretValue
POST. Pinned to AWS's documented signing example in
tests/test_providers_crypto.py.
"""

from __future__ import annotations

import hashlib
import hmac
import urllib.parse


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def signing_key(secret_key: str, date: str, region: str,
                service: str) -> bytes:
    """kSigning = HMAC-chain over date/region/service/'aws4_request'."""
    k = _hmac(("AWS4" + secret_key).encode(), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def canonical_request(method: str, url: str, headers: dict[str, str],
                      payload_hash: str) -> tuple[str, str]:
    """→ (canonical request, signed-header list). Headers must already
    include host and x-amz-date."""
    u = urllib.parse.urlsplit(url)
    path = urllib.parse.quote(u.path or "/", safe="/-_.~")
    q = urllib.parse.parse_qsl(u.query, keep_blank_values=True)
    cq = "&".join(f"{urllib.parse.quote(k, safe='-_.~')}="
                  f"{urllib.parse.quote(v, safe='-_.~')}"
                  for k, v in sorted(q))
    low = {k.lower().strip(): " ".join(v.split()) for k, v in headers.items()}
    signed = ";".join(sorted(low))
    ch = "".join(f"{k}:{low[k]}\n" for k in sorted(low))
    cr = "\n".join([method.upper(), path, cq, ch, signed, payload_hash])
    return cr, signed


def sign(method: str, url: str, headers: dict[str, str], body: bytes, *,
         access_key: str, secret_key: str, region: str, service: str,
         amz_date: str, session_token: str | None = None) -> dict[str, str]:
    """Return the headers dict WITH the Authorization header added.
    ``amz_date`` is the ISO-basic timestamp (YYYYMMDD'T'HHMMSS'Z') —
    passed in by the caller, never sampled here (determinism rule)."""
    out = dict(headers)
    u = urllib.parse.urlsplit(url)
    out.setdefault("host", u.netloc)
    out.setdefault("x-amz-date", amz_date)
    if session_token:
        out.setdefault("x-amz-security-token", session_token)
    payload_hash = hashlib.sha256(body).hexdigest()
    cr, signed = canonical_request(method, url, out, payload_hash)
    date = amz_date[:8]
    scope = f"{date}/{region}/{service}/aws4_request"
    sts = "\n".join(["AWS4-HMAC-SHA256", amz_date, scope,
                     hashlib.sha256(cr.encode()).hexdigest()])
    sig = hmac.new(signing_key(secret_key, date, region, service),
                   sts.encode(), hashlib.sha256).hexdigest()
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}")
    return out
