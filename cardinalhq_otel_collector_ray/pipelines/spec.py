"""Declarative pipeline specs — the collector-config-YAML analog.

The reference wires named components into per-signal pipelines via YAML
(``examples/local-debug/debug-all-signals.yaml:1-26``; SURVEY §2.5). Here a
pipeline is a plain dict (JSON/YAML-loadable) compiled into a lazy Ray Data
op chain:

    spec = {
      "source": {"kind": "parquet", "table": "documents",
                 "columns": ["doc_id", "text", "source"]},
      "stages": [
        {"kind": "parse_regex", "column": "text",
         "pattern": "^(?P<head_word>\\w+)"},
        {"kind": "flag_regex", "column": "text", "pattern": "\\bslow\\b",
         "out": "has_slow"},
        {"kind": "enrich", "key": "source", "table": {...}},
        {"kind": "sample", "id_column": "doc_id", "percent": 10},
        {"kind": "drop_where", "column": "has_slow", "equals": True},
        {"kind": "replace_pattern", "column": "text", "pattern": "\\d+",
         "replacement": "#"},
        {"kind": "select", "columns": [...]},
      ],
    }
    ds = compile_pipeline(spec, sf_dir)

Unknown stage kinds raise at compile time (the collector's config
validation analog). Stages compose lazily — nothing executes until a sink
or consumption call.
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.parquet import read_table
from ..stages import enrich, parse, route, sample, transform

StageFn = Callable[[ray.data.Dataset, dict], ray.data.Dataset]


def _s_tokenize(ds, cfg):
    """Tokenized-sequence intake stage (the flagship's receiver analog,
    sources/tokenized.py): adds tokens:list<int32> + n_tok:int32 from the
    corpus-derived broadcast vocab. ``keep_text: true`` keeps the text
    column flowing for downstream regex stages."""
    import ray as _ray
    from ..sources.tokenized import Tokenizer, build_vocab
    vocab = build_vocab(cfg["_sf_dir"])
    ref = _ray.put(vocab)
    return ds.map_batches(Tokenizer(ref, keep_text=cfg.get("keep_text", False)),
                          batch_format="pyarrow", batch_size=None)


def _s_parse_regex(ds, cfg):
    return parse.parse_stage(ds, [parse.ParseRule(cfg["column"], cfg["pattern"])],
                             concurrency=cfg.get("concurrency"))


def _s_flag_regex(ds, cfg):
    return parse.flag_substring(ds, cfg["column"], cfg["pattern"], cfg["out"])


def _s_enrich(ds, cfg):
    return enrich.enrich_stage(ds, cfg["table"], cfg["key"],
                               concurrency=cfg.get("concurrency"),
                               miss_value=cfg.get("miss_value"))


def _s_stamp(ds, cfg):
    return enrich.stamp_columns(ds, cfg["values"])


def _s_sample(ds, cfg):
    return sample.probabilistic_sample(ds, cfg["id_column"], cfg["percent"],
                                       salt=cfg.get("salt", 12345))


def _s_drop_where(ds, cfg):
    col, val = cfg["column"], cfg["equals"]
    return sample.drop_where(ds, lambda t: pc.equal(t[col], val))


def _s_replace_pattern(ds, cfg):
    return transform.replace_pattern(ds, cfg["column"], cfg["pattern"],
                                     cfg["replacement"], out=cfg.get("out"))


def _s_normalize_text(ds, cfg):
    """CCNet canonicalization (accents/case/digits/whitespace) before
    dedup or hashing."""
    return transform.normalize_text(
        ds, column=cfg.get("column", "text"), out=cfg.get("out"),
        lowercase=bool(cfg.get("lowercase", True)),
        strip_accents=bool(cfg.get("strip_accents", True)),
        digits_to_zero=bool(cfg.get("digits_to_zero", True)),
        collapse_whitespace=bool(cfg.get("collapse_whitespace", True)))


def _s_rename(ds, cfg):
    return transform.rename_columns(ds, cfg["mapping"])


def _s_delete(ds, cfg):
    return transform.delete_columns(ds, cfg["columns"])


def _s_hash(ds, cfg):
    return transform.hash_column(ds, cfg["column"], cfg["out"])


def _s_select(ds, cfg):
    return ds.select_columns(cfg["columns"])


def _s_route(ds, cfg):
    col = cfg.get("column")
    if col is not None:
        # route BY an existing column's values (the per-attr routing
        # analog at spec level — e.g. a dataset_split's train/val/test
        # assignment doubles as the sink route). The topology needs the
        # sink-name set statically: list it under route.values.
        if "rules" in cfg:
            raise ValueError("route: use either 'column' or 'rules', not both")
        if col == "route":
            return ds

        def fn(b: pa.Table) -> pa.Table:
            if "route" in b.column_names:
                b = b.drop_columns(["route"])
            return b.append_column("route", b[col])
        return ds.map_batches(fn, batch_format="pyarrow")
    rules = []
    for r in cfg["rules"]:
        if r["kind"] == "equals":
            col, val, sink = r["column"], r["value"], r["sink"]
            rules.append(route.RouteRule(
                sink, lambda t, c=col, v=val: pc.equal(t[c], v).to_numpy(
                    zero_copy_only=False)))
        elif r["kind"] == "sample":
            rules.append(route.sample_rule(r["sink"], r["id_column"],
                                           r["percent"], salt=r.get("salt", 12345)))
        else:
            raise ValueError(f"unknown route rule kind: {r['kind']}")
    return route.route_stage(ds, rules, default_sink=cfg.get("default", "default"))


def _s_epoch_ms(ds, cfg):
    """Timestamp column → int64 epoch-milliseconds (the reference's
    epoch-ms ↔ timestamp scalar conversions, aggregate.go:64-66)."""
    col, out = cfg["column"], cfg.get("out", cfg["column"])

    _UNIT_PER_MS = {"s": None, "ms": 1, "us": 1000, "ns": 1_000_000}

    def fn(b: pa.Table) -> pa.Table:
        c = b[col]
        unit = c.type.unit if pa.types.is_timestamp(c.type) else "ms"
        raw = c.cast(pa.int64())
        per = _UNIT_PER_MS[unit]
        if per is None:  # seconds → multiply
            ms = pc.multiply(raw, 1000)
        elif per == 1:
            ms = raw
        else:  # sub-ms units → floor divide (truncation, like pdata)
            ms = pc.divide(raw, per)
        if out in b.column_names:
            return b.set_column(b.column_names.index(out), out, ms)
        return b.append_column(out, ms)
    return ds.map_batches(fn, batch_format="pyarrow")


def _s_interval_aggregate(ds, cfg):
    """C2 interval groupby-aggregate (aggregationprocessor analog)."""
    from ..stages.aggregate import interval_aggregate
    return interval_aggregate(ds, ts_col=cfg["ts"],
                              interval_ms=cfg["interval_ms"],
                              keys=cfg["keys"], value_col=cfg["value"],
                              out_ts_col=cfg.get("out_ts"),
                              mode=cfg.get("mode", "shuffle"))


def _s_aggregate(ds, cfg):
    """count/sum connector analog (non-windowed grouped aggregate)."""
    from ..stages.aggregate import grouped_aggregate
    return grouped_aggregate(ds, keys=cfg["keys"], value_col=cfg["value"],
                             mode=cfg.get("mode", "shuffle"))


def _s_summary_split(ds, cfg):
    """C4 summarysplit explode."""
    from ..stages.summarysplit import summarysplit_stage
    return summarysplit_stage(ds, **cfg.get("options", {}))


def _s_logdedup(ds, cfg):
    from ..stages.temporal import interval_dedup
    return interval_dedup(ds, keys=cfg["keys"], ts_col=cfg["ts"],
                          interval_ms=cfg["interval_ms"],
                          tiebreak_cols=cfg.get("tiebreak"))


def _s_sessionize(ds, cfg):
    from ..stages.temporal import sessionize
    return sessionize(ds, key=cfg["key"], ts_col=cfg["ts"],
                      gap_ms=cfg["gap_ms"])


def _s_cumulative_to_delta(ds, cfg):
    from ..stages.temporal import cumulative_to_delta
    return cumulative_to_delta(ds, keys=cfg["keys"], ts_col=cfg["ts"],
                               value_col=cfg["value"],
                               out=cfg.get("out", "delta"),
                               tiebreak_cols=cfg.get("tiebreak"))


def _s_delta_to_rate(ds, cfg):
    from ..stages.temporal import delta_to_rate
    return delta_to_rate(ds, keys=cfg["keys"], ts_col=cfg["ts"],
                         value_col=cfg["value"], out=cfg.get("out", "rate"),
                         tiebreak_cols=cfg.get("tiebreak"))


def _s_drain(ds, cfg):
    from ..stages.drain import drain_templates
    return drain_templates(ds, cfg["text"], cfg["id"],
                           sim_threshold=cfg.get("sim_threshold", 0.5))


def _s_dedup_exact(ds, cfg):
    from ..stages.dedup import exact_dedup_stats
    return exact_dedup_stats(ds, content_col=cfg["content"], id_col=cfg["id"])


def _s_history_table(cfg):
    """Side-source for the incremental dedup kinds: a table read from the
    same dataset root, optionally column-pruned at the read."""
    from ..sources import read_table
    cols = [cfg["content"], cfg["id"]]
    return read_table(cfg["_sf_dir"], cfg["history_table"], columns=cols)


def _s_dedup_history(ds, cfg):
    """Cross-run incremental exact dedup (kind: dedup_history): keep the
    min-id per distinct content absent from ``history_table``."""
    from ..stages.dedup import dedup_against_history
    return dedup_against_history(ds, _s_history_table(cfg),
                                 cfg["content"], cfg["id"],
                                 num_partitions=cfg.get("partitions", 64))


def _s_chunk(ds, cfg):
    """Sliding-window chunking (kind: chunk): explode a tokens column into
    size-token windows every stride tokens (pairs with kind: tokenize)."""
    from ..stages.packing import chunk_tokens
    return chunk_tokens(ds, tokens_col=cfg.get("tokens", "tokens"),
                        id_col=cfg.get("id", "doc_id"),
                        size=cfg["size"], stride=cfg.get("stride",
                                                         cfg["size"]),
                        emit_tokens=cfg.get("emit_tokens", False))


def _s_neardup_history(ds, cfg):
    """Fuzzy incremental dedup (kind: neardup_history): flag rows with an
    exact shingle-Jaccard ≥ threshold near-dup in ``history_table``."""
    from ..stages.dedup import neardup_against_history
    return neardup_against_history(ds, _s_history_table(cfg),
                                   cfg["content"], cfg["id"],
                                   threshold=cfg.get("threshold", 0.8),
                                   k_shingle=cfg.get("k_shingle", 6))


def _s_quality_stats(ds, cfg):
    from ..stages.textstats import quality_stats
    return quality_stats(ds, text_col=cfg.get("text", "text"))


def _s_langid(ds, cfg):
    from ..stages.textstats import langid_scores
    return langid_scores(ds, text_col=cfg.get("text", "text"))


def _s_redact_pii(ds, cfg):
    from ..stages.transform import redact_pii
    return redact_pii(ds, cfg["column"], out=cfg.get("out"))


def _s_stratified_sample(ds, cfg):
    from ..stages.sample import stratified_sample
    return stratified_sample(ds, key=cfg["key"], id_col=cfg["id"],
                             k=int(cfg["k"]), salt=int(cfg.get("salt", 777)))


def _s_winnow(ds, cfg):
    from ..stages.textstats import winnow_fingerprints
    return winnow_fingerprints(ds, text_col=cfg.get("text", "text"),
                               id_col=cfg.get("id", "doc_id"),
                               k=int(cfg.get("k", 5)), w=int(cfg.get("w", 8)))


def _s_iforest(ds, cfg):
    from ..stages.anomaly import (IsolationForest,
                                  deterministic_sample_matrix,
                                  iforest_score_stage)
    feats = list(cfg["features"])
    X = deterministic_sample_matrix(ds, feats, id_col=cfg["id"],
                                    target_rows=int(cfg.get("sample_rows", 4096)),
                                    total_rows=cfg.get("total_rows"))
    forest = IsolationForest(n_trees=int(cfg.get("trees", 64)),
                             sample_size=int(cfg.get("tree_sample", 256)),
                             seed=int(cfg.get("seed", 7))).fit(X)
    return iforest_score_stage(ds, forest, feats,
                               out=cfg.get("out", "iforest_score"))


def _s_median_mad(ds, cfg):
    from ..stages.window import grouped_median_mad
    return grouped_median_mad(ds, keys=list(cfg["keys"]), value_col=cfg["value"])


def _s_weighted_sample(ds, cfg):
    import ray.data as _rd

    from ..stages.sample import weighted_priority_sample
    top = weighted_priority_sample(ds, id_col=cfg["id"],
                                   weight_col=cfg["weight"],
                                   k=int(cfg["k"]))
    return _rd.from_pandas(top)


def _s_compression_ratio(ds, cfg):
    from ..stages.textstats import compression_ratio
    return compression_ratio(ds, text_col=cfg.get("text", "text"),
                             id_col=cfg.get("id", "doc_id"))


def _s_rewrap_lines(ds, cfg):
    """Deterministic fixed-width re-wrap of space-joined text into
    '\\n'-separated lines of ``base + (id % mod)`` words — line-structure
    derivation for newline-free corpora (feed into ``line_clean`` /
    ``paragraph_dedup``)."""
    from ..stages.lineclean import rewrap_lines
    return rewrap_lines(ds, text_col=cfg.get("text", "text"),
                        id_col=cfg.get("id", "doc_id"),
                        base=int(cfg.get("base", 3)),
                        mod=int(cfg.get("mod", 5)))


def _s_line_clean(ds, cfg):
    """C4 line cleaning (Raffel et al. 2020 §2.2): min-words /
    within-doc-repeat / min-lines rules. ``apply: true`` emits the
    EDITED pages; default emits per-doc survivor stats. Block-local —
    place anywhere; expects '\\n'-separated text (a ``text`` file source
    is already line-per-row; use this on doc-shaped text)."""
    kw = dict(text_col=cfg.get("text", "text"),
              id_col=cfg.get("id", "doc_id"),
              min_words=int(cfg.get("min_words", 4)),
              min_lines=int(cfg.get("min_lines", 2)))
    if cfg.get("apply"):
        from ..stages.lineclean import c4_line_clean_apply
        return c4_line_clean_apply(ds, **kw)
    from ..stages.lineclean import c4_line_clean
    return c4_line_clean(ds, **kw)


def _s_paragraph_dedup(ds, cfg):
    """Corpus-wide first-occurrence paragraph dedup (Dolma / CCNet
    §4.1): skinny digest shuffle for the decision. ``apply: true`` emits
    the EDITED corpus (duplicated lines removed, one co-partition mark
    join — full text moves once); default emits per-doc survivor
    stats."""
    text, idc = cfg.get("text", "text"), cfg.get("id", "doc_id")
    if cfg.get("apply"):
        from ..stages.lineclean import paragraph_dedup_apply
        return paragraph_dedup_apply(ds, text_col=text, id_col=idc)
    from ..stages.lineclean import paragraph_dedup_stats
    return paragraph_dedup_stats(ds, text_col=text, id_col=idc)


def _s_retention(ds, cfg):
    from ..stages.temporal import retention_cohorts
    return retention_cohorts(ds, user_col=cfg["user"], ts_col=cfg["ts"],
                             bucket_ms=int(cfg["bucket_ms"]))


def _s_token_budget(ds, cfg):
    from ..stages.packing import token_budget_sample
    budgets = cfg["budgets"]
    if isinstance(budgets, dict):
        budgets = {k: int(v) for k, v in budgets.items()}
    else:
        budgets = int(budgets)
    return token_budget_sample(ds, key=cfg["key"], id_col=cfg["id"],
                               len_col=cfg["len"], budgets=budgets)


def _s_rank(ds, cfg):
    """Per-key SQL window ranking (adds rnk / pct / tile columns): the
    declarative form of ``windowed_rank`` — e.g. quality terciles per
    source. ``tiebreak`` must make the order total or ntile assignment
    is blocking-dependent (same contract as a SQL ORDER BY)."""
    from ..stages.window import windowed_rank
    return windowed_rank(ds, keys=list(cfg["keys"]), value_col=cfg["value"],
                         tiebreak_col=cfg["tiebreak"],
                         ntile=int(cfg.get("ntile", 4)))


def _s_temperature_mix(ds, cfg):
    """α=0.5 temperature source mixing: one global token ``total``, the
    per-source budgets derived from sqrt-damped corpus shares. Two
    passes — the stage materializes its (skinny) input, so place it
    after column pruning in the spec."""
    from ..stages.packing import temperature_mix
    return temperature_mix(ds, key=cfg["key"], id_col=cfg["id"],
                           len_col=cfg["len"], total=int(cfg["total"]),
                           salt=int(cfg.get("salt", 4242)))


def _s_join_table(ds, cfg):
    """Broadcast join against another parquet table (the k8sattributes /
    dimension-enrich shape for TABLE-shaped dims; use ``enrich`` for
    dict-shaped ones). The dim table is read once on the driver and
    ``ray.put`` once — small-side contract."""
    import pyarrow.parquet as pq

    from ..stages.join import broadcast_join
    dim = pq.read_table(f"{cfg['_sf_dir']}/{cfg['table']}.parquet",
                        columns=cfg.get("columns")).to_pandas()
    return broadcast_join(ds, dim, on=cfg["on"], how=cfg.get("how", "left"))


def _s_unroll(ds, cfg):
    """unrollprocessor analog (components.go:147): one row per element of
    a list column."""
    import numpy as np
    import pyarrow as _pa

    col, out = cfg["column"], cfg.get("out", "element")
    keep = cfg.get("keep", None)

    def fn(batch: _pa.Table) -> _pa.Table:
        lc = batch[col]
        if isinstance(lc, _pa.ChunkedArray):
            lc = lc.combine_chunks()
        offsets = lc.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_per = np.diff(offsets)
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), n_per)
        cols = {c: batch[c].take(_pa.array(idx))
                for c in (keep or [c for c in batch.column_names if c != col])}
        cols[out] = lc.values
        return _pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def _s_pack_sequences(ds, cfg):
    from ..stages.packing import pack_sequences
    return pack_sequences(ds, key=cfg["key"], order_col=cfg["order"],
                          len_col=cfg["len"],
                          context_len=int(cfg["context_len"]))


def _s_dataset_split(ds, cfg):
    from ..stages.packing import dataset_split
    th = cfg.get("thresholds", (80, 90))
    return dataset_split(ds, id_col=cfg["id"], thresholds=(int(th[0]),
                                                           int(th[1])),
                         out=cfg.get("out", "split"))


def _s_shuffle_shards(ds, cfg):
    from ..stages.packing import shuffle_shards
    return shuffle_shards(ds, cfg["id"],
                          num_shards=int(cfg.get("num_shards", 64)),
                          pos_salt=int(cfg.get("pos_salt", 777)))


def _s_funnel(ds, cfg):
    from ..stages.temporal import funnel_match
    return funnel_match(ds, key=cfg["key"], ts_col=cfg["ts"],
                        type_col=cfg["type"], first_step=cfg["first"],
                        second_step=cfg["second"],
                        window_ms=int(cfg["window_ms"]))


def _s_moving_window(ds, cfg):
    from ..stages.window import windowed_moving_agg
    return windowed_moving_agg(ds, keys=list(cfg["keys"]), ts_col=cfg["ts"],
                               value_col=cfg["value"],
                               tiebreak_col=cfg["tiebreak"],
                               window_rows=int(cfg["window_rows"]))


def _s_token_entropy(ds, cfg):
    from ..stages.textstats import token_entropy
    return token_entropy(ds, tokens_col=cfg.get("tokens", "tokens"),
                         id_col=cfg.get("id", "doc_id"))


def _s_inverted_index(ds, cfg):
    from ..stages.relevance import inverted_index
    return inverted_index(ds, tokens_col=cfg.get("tokens", "tokens"),
                          id_col=cfg.get("id", "doc_id"))


_STAGES: dict[str, StageFn] = {
    "parse_regex": _s_parse_regex,
    "tokenize": _s_tokenize,
    "flag_regex": _s_flag_regex,
    "enrich": _s_enrich,
    "stamp": _s_stamp,
    "sample": _s_sample,
    "drop_where": _s_drop_where,
    "replace_pattern": _s_replace_pattern,
    "normalize_text": _s_normalize_text,
    "rename": _s_rename,
    "delete": _s_delete,
    "hash": _s_hash,
    "select": _s_select,
    "route": _s_route,
    "epoch_ms": _s_epoch_ms,
    "interval_aggregate": _s_interval_aggregate,
    "aggregate": _s_aggregate,
    "summary_split": _s_summary_split,
    "logdedup": _s_logdedup,
    "sessionize": _s_sessionize,
    "cumulative_to_delta": _s_cumulative_to_delta,
    "delta_to_rate": _s_delta_to_rate,
    "drain": _s_drain,
    "dedup_exact": _s_dedup_exact,
    "dedup_history": _s_dedup_history,
    "neardup_history": _s_neardup_history,
    "quality_stats": _s_quality_stats,
    "langid": _s_langid,
    "redact_pii": _s_redact_pii,
    "stratified_sample": _s_stratified_sample,
    "winnow": _s_winnow,
    "iforest": _s_iforest,
    "pack_sequences": _s_pack_sequences,
    "chunk": _s_chunk,
    "dataset_split": _s_dataset_split,
    "shuffle_shards": _s_shuffle_shards,
    "funnel": _s_funnel,
    "moving_window": _s_moving_window,
    "token_entropy": _s_token_entropy,
    "inverted_index": _s_inverted_index,
    "token_budget": _s_token_budget,
    "temperature_mix": _s_temperature_mix,
    "rank": _s_rank,
    "join_table": _s_join_table,
    "unroll": _s_unroll,
    "median_mad": _s_median_mad,
    "weighted_sample": _s_weighted_sample,
    "compression_ratio": _s_compression_ratio,
    "retention": _s_retention,
    "rewrap_lines": _s_rewrap_lines,
    "line_clean": _s_line_clean,
    "paragraph_dedup": _s_paragraph_dedup,
}


def compile_pipeline(spec: dict[str, Any], sf_dir: str) -> ray.data.Dataset:
    src = spec["source"]
    if src["kind"] == "parquet":
        ds = read_table(sf_dir, src["table"], columns=src.get("columns"))
    elif src["kind"] in ("jsonl", "text", "csv"):
        # file sources (filelogreceiver analog, declaratively): `path`
        # resolves relative to sf_dir so specs stay scale-portable
        import os
        from ..sources.textjson import read_csv, read_jsonl, read_text_lines
        path = src["path"]
        if not os.path.isabs(path):
            path = os.path.join(sf_dir, path)
        ds = {"jsonl": read_jsonl, "text": read_text_lines,
              "csv": read_csv}[src["kind"]](path)
        if src.get("columns"):
            ds = ds.select_columns(src["columns"])
    elif src["kind"] == "sink":
        # re-ingest another pipeline's sink output (the collector-to-
        # collector receiver shape): path is a sink root or object list
        import os

        from ..sources.sinkfiles import read_sink_output
        path = src["path"]
        if not os.path.isabs(path) and "://" not in path:
            path = os.path.join(sf_dir, path)
        ds = read_sink_output(path, fmt=src.get("format", "jsonl"),
                              compression=src.get("compression", "auto"))
        if src.get("columns"):
            ds = ds.select_columns(src["columns"])
    else:
        raise ValueError(f"unknown source kind: {src['kind']}")
    for i, st in enumerate(spec.get("stages", [])):
        kind = st.get("kind")
        if kind not in _STAGES:
            raise ValueError(f"stage {i}: unknown kind {kind!r}; "
                             f"known: {sorted(_STAGES)}")
        ds = _STAGES[kind](ds, {**st, "_sf_dir": sf_dir})
    return ds


def load_spec(path: str, resolve: bool = True) -> dict:
    """Load a pipeline spec from YAML or JSON (collector-YAML analog).

    With ``resolve=True`` (default) the spec goes through the config
    provider chain (``providers.resolve_config`` — ``${env:…}``,
    ``${file:…}``, ``${yaml:…}``, registered schemes; the confmap contract
    of ``distribution/main.go:35-45``), and a top-level ``include: <path>``
    key deep-merges that base spec file underneath this one (the file
    provider's composition pattern) — includes resolve first, recursively,
    relative to the including file's directory."""
    spec = _load_raw(path, set()) if resolve else _parse_spec_file(path)
    if not resolve:
        return spec
    from .providers import resolve_config
    return resolve_config(spec)  # resolve ONCE, after all includes merged


def _parse_spec_file(path: str) -> dict:
    import json
    with open(path) as f:
        text = f.read()
    if path.endswith((".yaml", ".yml")):
        import yaml
        return yaml.safe_load(text)
    return json.loads(text)


def _load_raw(path: str, seen: set) -> dict:
    """Parse + merge the include chain WITHOUT resolving references —
    resolution must run exactly once on the merged tree, or escaped
    ``$${…}`` literals in a base spec get double-expanded."""
    import os.path
    real = os.path.realpath(path)
    if real in seen:
        raise ValueError(f"circular spec include: {path}")
    spec = _parse_spec_file(path)
    inc = spec.pop("include", None)
    if inc is not None:
        from .providers import deep_merge
        base = _load_raw(os.path.join(os.path.dirname(path) or ".", inc),
                         seen | {real})
        spec = deep_merge(base, spec)
    return spec


def compile_topology(spec: dict[str, Any], sf_dir: str) -> dict[str, ray.data.Dataset]:
    """Full collector topology: source → shared stages → route fan-out →
    PER-SINK stage chains (the reference's per-vendor enforce pipelines,
    ``docs/flow/flow.dot:27-104``: each forward target gets its own
    filter/sample/batch chain before its exporter).

        spec = {
          "source": {...}, "stages": [...],       # shared decorate chain
          "route": {"default": "main", "rules": [...]},
          "sinks": {
            "main":   {"stages": [...]},          # per-sink enforcement
            "errors": {"stages": [{"kind": "sample", ...}]},
          },
        }

    Returns {sink_name: Dataset} — one lazy view per sink (rows whose
    ``route`` == sink, with that sink's chain applied). Sinks present in
    the route rules but absent from ``sinks`` get a bare passthrough.
    """
    from ..stages.route import sink_view

    ds = compile_pipeline({"source": spec["source"],
                           "stages": spec.get("stages", [])}, sf_dir)
    route_cfg = spec.get("route")
    if route_cfg is None:
        raise ValueError("topology spec requires a 'route' section")
    ds = _s_route(ds, route_cfg)

    sink_specs = spec.get("sinks", {})
    names = (set(sink_specs) | {r["sink"] for r in route_cfg.get("rules", [])}
             | set(route_cfg.get("values", [])))
    if "column" not in route_cfg:
        names |= {route_cfg.get("default", "default")}
    elif not names:
        raise ValueError("column-routed topology needs route.values (or "
                         "sinks:) to name its sink views")
    out: dict[str, ray.data.Dataset] = {}
    for name in sorted(names):
        view = sink_view(ds, name)
        for i, st in enumerate(sink_specs.get(name, {}).get("stages", [])):
            kind = st.get("kind")
            if kind not in _STAGES:
                raise ValueError(f"sink {name} stage {i}: unknown kind {kind!r}")
            # same _sf_dir injection as compile_pipeline — sink chains may
            # use side-source kinds (tokenize, join_table, *_history)
            view = _STAGES[kind](view, {**st, "_sf_dir": sf_dir})
        out[name] = view
    return out


def _resolve_callable(path: str):
    """'pkg.module:attr' (or dotted 'pkg.module.attr') → the callable —
    the encoding-extension-ID lookup of marshaler.go:27-40 expressed as a
    Python import path."""
    import importlib
    if ":" in path:
        mod, attr = path.split(":", 1)
    else:
        mod, _, attr = path.rpartition(".")
    if not mod:
        raise ValueError(f"marshaler fn must be 'module:attr', got {path!r}")
    fn = getattr(importlib.import_module(mod), attr, None)
    if not callable(fn):
        raise ValueError(f"marshaler fn {path!r} did not resolve to a callable")
    return fn


def register_spec_marshalers(spec: dict[str, Any]) -> None:
    """Config-driven encoding-extension registration (config.go:110-112
    parity): a top-level ``marshalers`` block maps custom format names to
    an import path + file extension::

        marshalers:
          csv: {fn: "my_pkg.formats:to_csv", extension: "csv"}

    Registered formats become valid sink ``format:`` values for this
    process (idempotent: re-registering the same spec overwrites)."""
    from ..sinks.serializers import register_marshaler
    for fmt, cfg in (spec.get("marshalers") or {}).items():
        register_marshaler(fmt, _resolve_callable(cfg["fn"]),
                           cfg["extension"], overwrite=True)


def write_topology(spec: dict[str, Any], sf_dir: str):
    """Compile a topology spec and WRITE every sink view through one
    ``PartitionedSink`` — the spec-driven exporter path. The ``write``
    block mirrors the sink constructor (config.go:18-147 surface)::

        write:
          root: /data/out            # or s3://…
          run_ts: 1706078400.0       # fixed run timestamp (determinism)
          key_column: doc_id
          format: csv                # built-in or marshalers:-registered
          compression: gzip          # optional
          num_partitions: 16
          resume: true

    Returns ``(sink, manifest_entries)``. Custom ``marshalers:`` are
    registered BEFORE the sink builds, so the sink's build-time format
    validation and function resolution see them (marshaler.go:27-40)."""
    from ..sinks.partitioned import PartitionedSink
    register_spec_marshalers(spec)
    wcfg = spec.get("write")
    if not wcfg:
        raise ValueError("write_topology requires a 'write' section")
    sink = PartitionedSink(
        wcfg["root"], float(wcfg["run_ts"]),
        num_partitions=int(wcfg.get("num_partitions", 16)),
        signal=wcfg.get("signal", "logs"),
        file_prefix=wcfg.get("file_prefix", ""),
        fmt=wcfg.get("format", "parquet"),
        compression=wcfg.get("compression"),
        unique_key=wcfg.get("unique_key", "seq"),
        upload_options=wcfg.get("upload_options"))
    # fresh-run reset happens ONCE up front — per-view write(resume=False)
    # would wipe the previous view's manifest entries mid-run
    if not bool(wcfg.get("resume", True)):
        sink.manifest.reset()
    entries = []
    for name, view in compile_topology(spec, sf_dir).items():
        entries.extend(sink.write(view, key_col=wcfg["key_column"],
                                  resume=True))
    return sink, entries
