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


# Reference parity: the collector binary ships http/https/s3 in its default
# provider chain (distribution/main.go:35-45) — register the real fetchers
# up front; deployments can still override via register_provider.
register_provider("http", lambda sel: http_provider(sel, scheme="http"))
register_provider("https", lambda sel: http_provider(sel, scheme="https"))
register_provider("s3", fsio_provider("s3"))


def deep_merge(base: Any, overlay: Any) -> Any:
    """Overlay wins; dicts merge key-wise, everything else replaces —
    confmap's Merge semantics for composed config sources."""
    if isinstance(base, dict) and isinstance(overlay, dict):
        out = dict(base)
        for k, v in overlay.items():
            out[k] = deep_merge(base[k], v) if k in base else v
        return out
    return overlay
