"""Config-provider resolution for pipeline specs — the confmap analog.

The reference's collector binary resolves ``${scheme:uri}`` references in
its YAML through a provider chain (``distribution/main.go:35-45``: env,
file, http/https, yaml, aes, s3, secretsmanager, googlesecretmanager — the
standard OpenTelemetry confmap contract). This module implements the same
public contract over plain dict specs:

- ``${env:NAME}`` (and the bare default-scheme form ``${NAME}``) — process
  environment, with the confmap default syntax ``${env:NAME:-fallback}``.
- ``${file:/path}`` — file contents; parsed as YAML/JSON when the
  reference is the WHOLE string (so it can yield a map/list/number),
  spliced in verbatim when embedded inside a larger string.
- ``${yaml:...}`` — inline YAML literal (``${yaml:[1,2,3]}`` → list).
- ``${http://…}`` / ``${https://…}`` — REAL fetchers via urllib
  (pre-registered, matching the reference chain
  ``distribution/main.go:35-45``), parsed like the file provider.
- ``${s3://bucket/key}`` — fetched through the :mod:`..fsio` object-store
  layer (same pyarrow/fsspec resolution the sinks use).
- Anything else (``secretsmanager:``, ``aes:``, …) dispatches through
  :func:`register_provider` hooks so deployments wire real fetchers;
  unregistered schemes raise at resolve time (config validation, not
  silent passthrough).

Resolution is innermost-first and recursive (a provider's output is
re-resolved, depth-capped), matching confmap's expansion order, and a
spec-level ``include:`` key deep-merges a base spec file underneath the
including document (the file-provider composition pattern).
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable

# ${scheme:selector} with no nested ${ } inside — innermost-first expansion.
_REF = re.compile(r"\$\{([^${}]*)\}")
_MAX_DEPTH = 32

ProviderFn = Callable[[str], Any]
_PROVIDERS: dict[str, ProviderFn] = {}


def register_provider(scheme: str, fn: ProviderFn) -> None:
    """Register/override a ``${scheme:selector}`` resolver. ``fn`` gets the
    selector (everything after the first ``:``) and returns the value —
    strings are re-resolved, non-strings splice as-is when the reference is
    the whole string."""
    _PROVIDERS[scheme] = fn


def unregister_provider(scheme: str) -> None:
    _PROVIDERS.pop(scheme, None)


def _parse_scalar(text: str) -> Any:
    """Parse provider output the way confmap does: YAML when available
    (superset of JSON), JSON as fallback, raw string if neither parses."""
    try:
        import yaml
        return yaml.safe_load(text)
    except ImportError:
        import json
        try:
            return json.loads(text)
        except ValueError:
            return text


def _resolve_ref(body: str) -> Any:
    """Resolve one ``${body}`` reference (no nesting inside)."""
    scheme, sep, selector = body.partition(":")
    known = scheme in ("env", "file", "yaml") or scheme in _PROVIDERS
    if (not sep or not re.fullmatch(r"[A-Za-z][A-Za-z0-9+.-]*", scheme)
            # bare-with-default ${NAME:-fallback}: the part before ':' is a
            # plain env var name, not a provider scheme
            or (not known and selector.startswith("-")
                and re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", scheme))):
        scheme, selector = "env", body  # default env scheme
    if scheme == "env":
        name, dsep, default = selector.partition(":-")
        val = os.environ.get(name)
        if val is None:
            if dsep:
                return default
            raise KeyError(f"config reference ${{env:{name}}}: "
                           f"environment variable not set and no default")
        return val
    if scheme == "file":
        with open(selector) as f:
            return _parse_scalar(f.read())
    if scheme == "yaml":
        return _parse_scalar(selector)
    if scheme in _PROVIDERS:
        return _PROVIDERS[scheme](selector)
    raise ValueError(
        f"config reference ${{{body}}}: no provider registered for scheme "
        f"{scheme!r} (built-in: env, file, yaml; add others with "
        f"register_provider)")


def _resolve_str(s: str, depth: int = 0) -> Any:
    if depth > _MAX_DEPTH:
        raise ValueError(f"config reference expansion too deep: {s!r}")
    m = _REF.fullmatch(s)
    if m:  # whole-string reference → provider value keeps its type
        val = _resolve_ref(m.group(1))
        return _resolve_str(val, depth + 1) if isinstance(val, str) else val

    def sub(mm: re.Match) -> str:
        val = _resolve_ref(mm.group(1))
        if isinstance(val, (dict, list)):
            raise ValueError(
                f"config reference ${{{mm.group(1)}}} resolves to a "
                f"{type(val).__name__} but is embedded in a string")
        return val if isinstance(val, str) else \
            ("true" if val is True else "false" if val is False else str(val))

    out, n = _REF.subn(sub, s)
    return _resolve_str(out, depth + 1) if n else out


def resolve_config(node: Any) -> Any:
    """Recursively resolve every ``${...}`` reference in a spec tree.
    ``$${`` escapes a literal ``${`` (confmap escaping)."""
    if isinstance(node, str):
        if "$${" in node:
            esc = node.replace("$${", "\x00{")
            out = _resolve_str(esc) if "${" in esc else esc
            if isinstance(out, str):
                return out.replace("\x00{", "${")
            raise ValueError(f"escaped reference in non-string splice: "
                             f"{node!r}")
        return _resolve_str(node) if "${" in node else node
    if isinstance(node, dict):
        return {k: resolve_config(v) for k, v in node.items()}
    if isinstance(node, list):
        return [resolve_config(v) for v in node]
    return node


def http_provider(selector: str, *, scheme: str = "http",
                  timeout: float = 10.0) -> Any:
    """Fetch ``${http://host/path}`` / ``${https://…}`` config fragments —
    the urllib analog of the reference chain's httpprovider
    (``distribution/main.go:35-45``). The selector is everything after the
    first ``:`` (``//host/path``), so the URL is rebuilt scheme-first;
    the body parses like the file provider (YAML/JSON superset)."""
    import urllib.request
    url = f"{scheme}:{selector}"
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return _parse_scalar(r.read().decode("utf-8"))


def fsio_provider(scheme: str) -> ProviderFn:
    """Provider that reads ``${scheme://root/key}`` through the
    :mod:`..fsio` object-store layer (pyarrow native FS or fsspec
    fallback) — the s3provider analog, reusing the exact filesystem
    resolution the sinks use."""
    def fetch(selector: str) -> Any:
        from .. import fsio
        return _parse_scalar(
            fsio.read_bytes(f"{scheme}:{selector}").decode("utf-8"))
    return fetch


def aes_provider(selector: str, *, key_env: str = "CONFMAP_AES_KEY") -> str:
    """``${aes:<base64>}`` → decrypted config value — the contrib
    aesprovider analog (``distribution/main.go:16,41``): AES-256-GCM with
    a base64 key from the environment, ciphertext laid out as
    nonce(12) || ct || tag(16) inside the base64 payload. Crypto is the
    FIPS-197/SP-800-38D implementation in :mod:`..functions.aesgcm`
    (NIST-vector-pinned) — no external crypto dependency."""
    import base64
    import os as _os
    from ..functions.aesgcm import gcm_decrypt
    key_b64 = _os.environ.get(key_env)
    if not key_b64:
        raise ValueError(f"aes provider requires the {key_env} environment "
                         "variable (base64 AES key)")
    key = base64.b64decode(key_b64)
    raw = base64.b64decode(selector)
    if len(raw) < 12 + 16:
        raise ValueError("aes provider payload too short for nonce+tag")
    pt = gcm_decrypt(key, raw[:12], raw[12:-16], raw[-16:])
    return pt.decode("utf-8")


def aes_encrypt_value(plaintext: str, key_b64: str, nonce: bytes) -> str:
    """Companion encryptor (tooling/tests): → the base64 payload the
    provider accepts. ``nonce`` is caller-supplied (12 bytes) — never
    sampled here (determinism rule; real tooling passes os.urandom)."""
    import base64
    from ..functions.aesgcm import gcm_encrypt
    assert len(nonce) == 12
    ct, tag = gcm_encrypt(base64.b64decode(key_b64), nonce,
                          plaintext.encode("utf-8"))
    return base64.b64encode(nonce + ct + tag).decode()


def secretsmanager_provider(selector: str, *, transport=None,
                            timeout: float = 10.0) -> Any:
    """``${secretsmanager:<name-or-arn>}`` → the SecretString — the
    contrib secretsmanagerprovider analog (``distribution/main.go:18,43``)
    as a REAL SigV4-signed GetSecretValue POST over urllib (no SDK;
    signing in :mod:`..functions.sigv4`, pinned to AWS's documented
    example). Region comes from the ARN when the selector is one, else
    AWS_REGION / AWS_DEFAULT_REGION; credentials from the standard env
    vars. ``transport(url, headers, body) -> bytes`` is injectable for
    tests (no network in CI); the default posts for real."""
    import json as _json
    import os as _os
    import time as _time
    from ..functions.sigv4 import sign

    region = None
    if selector.startswith("arn:"):
        parts = selector.split(":")
        region = parts[3] if len(parts) > 4 else None
    region = region or _os.environ.get("AWS_REGION") \
        or _os.environ.get("AWS_DEFAULT_REGION")
    if not region:
        raise ValueError("secretsmanager provider needs a region "
                         "(ARN selector or AWS_REGION)")
    ak = _os.environ.get("AWS_ACCESS_KEY_ID")
    sk = _os.environ.get("AWS_SECRET_ACCESS_KEY")
    if not ak or not sk:
        raise ValueError("secretsmanager provider requires "
                         "AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY")
    url = f"https://secretsmanager.{region}.amazonaws.com/"
    body = _json.dumps({"SecretId": selector}).encode()
    amz_date = _time.strftime("%Y%m%dT%H%M%SZ", _time.gmtime())
    headers = sign("POST", url,
                   {"content-type": "application/x-amz-json-1.1",
                    "x-amz-target": "secretsmanager.GetSecretValue"},
                   body, access_key=ak, secret_key=sk, region=region,
                   service="secretsmanager", amz_date=amz_date,
                   session_token=_os.environ.get("AWS_SESSION_TOKEN"))

    if transport is None:
        def transport(u, h, b):  # pragma: no cover - no network in CI
            import urllib.request
            req = urllib.request.Request(u, data=b, method="POST")
            for k, v in h.items():
                req.add_header(k, v)
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.read()
    resp = _json.loads(transport(url, headers, body))
    return resp.get("SecretString") or resp.get("SecretBinary")


# Reference parity: the collector binary ships http/https/s3/aes/
# secretsmanager in its default provider chain (distribution/main.go:35-45)
# — register the real fetchers up front; deployments can still override
# via register_provider. (googlesecretmanager stays a register_provider
# hook: its OAuth token exchange needs a service-account flow no stdlib
# primitive covers.)
register_provider("http", lambda sel: http_provider(sel, scheme="http"))
register_provider("https", lambda sel: http_provider(sel, scheme="https"))
register_provider("s3", fsio_provider("s3"))
register_provider("aes", aes_provider)
register_provider("secretsmanager", secretsmanager_provider)


def deep_merge(base: Any, overlay: Any) -> Any:
    """Overlay wins; dicts merge key-wise, everything else replaces —
    confmap's Merge semantics for composed config sources."""
    if isinstance(base, dict) and isinstance(overlay, dict):
        out = dict(base)
        for k, v in overlay.items():
            out[k] = deep_merge(base[k], v) if k in base else v
        return out
    return overlay
