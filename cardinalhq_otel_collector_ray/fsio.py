"""Object-store filesystem layer for sinks and manifests.

The reference's sink is an object-store uploader (S3 transfermanager
multipart with storage-class/ACL/GCS-compat endpoints,
``exporter/awss3exporter/internal/upload/s3_writer.go:54-132``,
``writer.go:92-155``); on a multi-node cluster there is no shared local
filesystem, so every sink/manifest path must accept ``s3://…`` /
``gs://…`` / ``file://…`` URIs, not just local paths.

``resolve_fs`` maps a root URI to a ``pyarrow.fs.FileSystem`` + an
FS-internal path: plain paths and ``file://`` → ``LocalFileSystem``;
schemes pyarrow knows natively (``s3://``, ``gs://``, ``hdfs://``) → the
native FS; anything else (e.g. ``memory://`` in tests) falls back to the
matching fsspec filesystem wrapped in ``PyFileSystem``. Every helper
below takes a full URI/path and resolves internally, so callers (Ray
tasks included) never hold — or pickle — a FileSystem object; fsspec's
own instance cache keeps per-process state (e.g. ``memory://``) shared.

Atomicity contract (the reason this module exists rather than bare
``fs.open_output_stream`` calls): on a LOCAL filesystem, readers must
never observe partial files, so writes go to ``<path>.tmp`` + atomic
``rename``. On object stores a PUT is already atomic — the object appears
only when the upload completes — so ``atomic_output`` writes directly (a
tmp+copy+delete dance would double the I/O for nothing; ``fs.move`` on
S3-likes is copy+delete, which is why we never rely on it there).
"""

from __future__ import annotations

import posixpath
from contextlib import contextmanager

import pyarrow as pa
import pyarrow.fs as pafs


def resolve_fs(path: str) -> tuple[pafs.FileSystem, str]:
    """Root URI or local path → (FileSystem, FS-internal path)."""
    if "://" not in path:
        return pafs.LocalFileSystem(), path
    try:
        return pafs.FileSystem.from_uri(path)
    except (pa.ArrowInvalid, ValueError):
        scheme, rest = path.split("://", 1)
        import fsspec
        fs = fsspec.filesystem(scheme)  # fsspec caches instances per scheme
        return pafs.PyFileSystem(pafs.FSSpecHandler(fs)), rest


def is_local(path: str) -> bool:
    """True when ``path`` lands on the local (POSIX-rename) filesystem."""
    return "://" not in path or path.startswith("file://")


def join(*parts: str) -> str:
    """Sink paths are always '/'-separated (object-store keys)."""
    return posixpath.join(*parts)


def dirname(path: str) -> str:
    return posixpath.dirname(path)


def makedirs(path: str) -> None:
    fs, p = resolve_fs(path)
    fs.create_dir(p, recursive=True)


def exists(path: str) -> bool:
    fs, p = resolve_fs(path)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def file_size(path: str) -> int:
    fs, p = resolve_fs(path)
    return int(fs.get_file_info(p).size or 0)


def read_bytes(path: str) -> bytes:
    fs, p = resolve_fs(path)
    with fs.open_input_stream(p) as f:
        return f.read()


def delete(path: str) -> None:
    fs, p = resolve_fs(path)
    fs.delete_file(p)


# S3 upload-options surface (reference: exporter/awss3exporter/internal/
# upload/writer.go:92-155, s3_writer.go:54-132 expose storage-class / ACL /
# object-metadata knobs; config validated at build like config_test.go).
_STORAGE_CLASSES = frozenset({
    "STANDARD", "STANDARD_IA", "ONEZONE_IA", "INTELLIGENT_TIERING",
    "GLACIER", "GLACIER_IR", "DEEP_ARCHIVE", "REDUCED_REDUNDANCY"})
_ACLS = frozenset({
    "private", "public-read", "public-read-write", "authenticated-read",
    "aws-exec-read", "bucket-owner-read", "bucket-owner-full-control"})


def upload_headers(upload_options: dict | None) -> dict[str, str] | None:
    """Validate sink upload options and map them to the object-store
    header/metadata dict passed to ``open_output_stream(metadata=…)``.

    Accepted keys: ``storage_class`` (S3 storage-class enum), ``acl``
    (canned ACL), ``content_type``, ``metadata`` (free-form str→str,
    sent as ``x-amz-meta-*``). Unknown keys and out-of-table values
    raise ``ValueError`` — config validation happens at sink BUILD time,
    not first write (factory.go:115-117 pattern).

    Key-name contract: pyarrow's native ``S3FileSystem`` only honors its
    own metadata names — ``ACL``, ``Content-Type``, ``Cache-Control``,
    ``Expires`` (``arrow/filesystem/s3fs.cc`` ObjectMetadataSetter) — and
    SILENTLY ignores anything else, so ``acl``/``content_type`` are
    emitted under those names. Arrow 16 has no setter for storage class
    or user metadata; those are emitted as the raw S3 header forms
    (``x-amz-storage-class`` / ``x-amz-meta-*``) so fsspec/s3fs-backed
    filesystems (which forward extra headers) can honor them.
    INTEGRATION NOTE (untestable here — no network): on a deployment
    whose sink root resolves to the NATIVE Arrow S3FileSystem, storage
    class and user metadata do not apply; route such sinks through an
    fsspec ``s3://`` filesystem or set the bucket's default storage
    class / lifecycle policy instead."""
    if not upload_options:
        return None
    known = {"storage_class", "acl", "content_type", "metadata"}
    unknown = set(upload_options) - known
    if unknown:
        raise ValueError(f"unknown upload option(s) {sorted(unknown)}; "
                         f"known: {sorted(known)}")
    headers: dict[str, str] = {}
    sc = upload_options.get("storage_class")
    if sc is not None:
        if sc not in _STORAGE_CLASSES:
            raise ValueError(f"unknown storage_class {sc!r}; "
                             f"known: {sorted(_STORAGE_CLASSES)}")
        headers["x-amz-storage-class"] = sc
    acl = upload_options.get("acl")
    if acl is not None:
        if acl not in _ACLS:
            raise ValueError(f"unknown acl {acl!r}; known: {sorted(_ACLS)}")
        headers["ACL"] = acl
    ct = upload_options.get("content_type")
    if ct is not None:
        headers["Content-Type"] = str(ct)
    meta = upload_options.get("metadata")
    if meta is not None:
        if not isinstance(meta, dict) or not all(
                isinstance(k, str) and isinstance(v, str)
                for k, v in meta.items()):
            raise ValueError("upload option 'metadata' must be a "
                             "str -> str mapping")
        for k, v in meta.items():
            headers[f"x-amz-meta-{k}"] = v
    return headers or None


def _open_output(fs: pafs.FileSystem, p: str,
                 headers: dict[str, str] | None):
    """Single seam through which every non-local sink byte flows — tests
    intercept it to assert upload headers reach the writer."""
    if headers:
        return fs.open_output_stream(p, metadata=headers)
    return fs.open_output_stream(p)


@contextmanager
def atomic_output(path: str, upload_options: dict | None = None):
    """Binary output stream whose result lands atomically at ``path``.

    Local FS: write ``<path>.tmp`` then atomic rename (readers never see
    a partial file; a retried deterministic partition overwrites in
    place). Object stores: write the key directly — PUT-on-close is
    already atomic, and the stream upload is the multipart analog of the
    reference's transfermanager (``s3_writer.go:54-132``). If the writer
    raises mid-stream, the close() that the ``with`` triggers would still
    COMPLETE the multipart upload and commit a truncated object, so the
    error path closes and then deletes the partially-committed key before
    re-raising — readers listing the sink root never keep a partial. The
    local branch likewise deletes the orphaned ``.tmp`` on error."""
    headers = upload_headers(upload_options)
    fs, p = resolve_fs(path)
    if headers and isinstance(fs, pafs.S3FileSystem):
        # the native Arrow S3FileSystem has no setter for storage class or
        # user metadata and silently drops unrecognized metadata keys —
        # surface the dropped options instead of pretending they applied
        # (ACL / Content-Type DO apply; see upload_headers)
        dropped = [k for k in headers if k.startswith("x-amz-")]
        if dropped:
            import logging
            logging.getLogger(__name__).warning(
                "upload options %s are not supported by pyarrow's native "
                "S3 filesystem and will NOT be applied to %s; set a bucket "
                "default storage class / lifecycle policy instead", dropped,
                path)
    # parent create is a no-op on real object stores (keys, not dirs) but
    # required by dir-ful filesystems reached through fsspec
    fs.create_dir(posixpath.dirname(p), recursive=True)
    if is_local(path):
        # upload options are object-store semantics; ignored on local FS
        tmp = p + ".tmp"
        try:
            with fs.open_output_stream(tmp) as f:
                yield f
        except BaseException:
            try:
                fs.delete_file(tmp)  # never leak a partial .tmp to globbers
            except Exception:
                pass
            raise
        fs.move(tmp, p)
    else:
        f = _open_output(fs, p, headers)
        try:
            yield f
        except BaseException:
            # pyarrow OutputStream has no abort/cancel API (the multipart
            # upload is completed by close()), so the best available is
            # close-then-delete: a lister can observe the truncated object
            # for the brief window between the two calls, and a FAILED
            # delete would leak it permanently — hence the loud warning.
            try:
                f.close()  # commits a truncated object …
            except Exception:
                pass
            try:
                fs.delete_file(p)  # … which we immediately remove
            except Exception as cleanup_err:
                import logging
                logging.getLogger(__name__).warning(
                    "failed to delete partially-written object %s after a "
                    "write error; a truncated object may be left behind: %s",
                    path, cleanup_err)
            raise
        else:
            f.close()


def write_bytes_atomic(path: str, data: bytes,
                       upload_options: dict | None = None) -> None:
    with atomic_output(path, upload_options) as f:
        f.write(data)


def open_input(path: str):
    """Random-access input file (for parquet reads back)."""
    fs, p = resolve_fs(path)
    return fs.open_input_file(p)


def list_files(dir_path: str) -> list[str]:
    """Full paths (original scheme re-attached) of files under ``dir_path``."""
    fs, p = resolve_fs(dir_path)
    if fs.get_file_info(p).type == pafs.FileType.NotFound:
        return []
    sel = pafs.FileSelector(p, recursive=True, allow_not_found=True)
    out = []
    prefix = dir_path[: len(dir_path) - len(p)] if dir_path.endswith(p) else ""
    for i in fs.get_file_info(sel):
        if i.type == pafs.FileType.File:
            out.append(prefix + i.path)
    return sorted(out)


def append_line(path: str, line: str) -> None:
    """Append one line. Local FS only: a single O_APPEND write ≤ PIPE_BUF
    is atomic on POSIX. Object stores have no append — callers must use
    one-object-per-record layouts there (see ``state/manifest.py``)."""
    assert is_local(path), "append_line is local-FS only"
    _, p = resolve_fs(path)
    with open(p, "a") as f:
        f.write(line)
