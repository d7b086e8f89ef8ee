"""CLI entry point — the ``ray job submit`` surface.

On a real cluster:

    ray job submit --working-dir . -- \
        python -m cardinalhq_otel_collector_ray.cli run \
            --sf-dir /data/sf --out s3://bucket/out --run-ts 1706078400

In this sandbox the same command runs against the local session. The CLI
owns a Ray session ONLY when it created one itself: ``_ensure_ray`` records
whether it called ``ray.init`` and ``main`` shuts down only in that case,
so programmatic invocation from a driver/test process that already holds a
session never has its session killed (the library itself never inits).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> bool:
    """Init Ray if no session exists. Returns True iff WE initialized it
    (the caller then owns shutdown); False when reusing an outer session."""
    import ray
    initialized_here = False
    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "ignore_reinit_error": True, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
        initialized_here = True
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    return initialized_here


def cmd_run(args) -> int:
    """Flagship parse→enrich→route→aggregate → partitioned sinks."""
    args._owns_ray = _ensure_ray(args.num_cpus)
    from .pipelines import run_to_sinks
    sink, entries = run_to_sinks(args.sf_dir, args.out, run_ts=args.run_ts,
                                 num_partitions=args.num_partitions,
                                 resume=not args.no_resume)
    completed = sink.manifest.completed()
    print(json.dumps({
        "out": args.out,
        "partitions_written": len(entries),
        "partitions_total": len(completed),
        "rows": sum(e.rows for e in completed.values()),
        "tokens": sum(e.tokens for e in completed.values()),
        "manifest": sink.manifest.path,
    }))
    return 0


def cmd_spec(args) -> int:
    """Compile a YAML/JSON pipeline spec and write its output as parquet."""
    args._owns_ray = _ensure_ray(args.num_cpus)
    from .pipelines.spec import compile_pipeline, load_spec
    ds = compile_pipeline(load_spec(args.spec), args.sf_dir)
    ds.write_parquet(args.out)
    print(json.dumps({"out": args.out, "spec": args.spec}))
    return 0


def cmd_query(args) -> int:
    """Run any registered driver-contract query (``__ray_entry__``
    surface) and write/print its result — the one-liner a reference user
    reaches for first when switching."""
    args._owns_ray = _ensure_ray(args.num_cpus)
    import importlib
    import ray.data
    entrymod = importlib.import_module("__ray_entry__")
    qs = entrymod.queries()
    if args.name not in qs:
        sys.stderr.write("unknown query %r; available: %s\n"
                         % (args.name, " ".join(sorted(qs))))
        return 2
    res = qs[args.name](args.sf_dir)
    if isinstance(res, ray.data.Dataset):
        if args.out:
            res.write_parquet(args.out)
            print(json.dumps({"query": args.name, "out": args.out}))
            return 0
        res = res.to_pandas()
    import pandas as pd
    import pyarrow as pa
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    if args.out:
        res.to_parquet(args.out)
        print(json.dumps({"query": args.name, "out": args.out,
                          "rows": len(res)}))
    else:
        with pd.option_context("display.max_rows", 20):
            print(res)
    return 0


def cmd_prep(args) -> int:
    """Composed training-data prep — exact+near dedup → quality gate →
    split → [optional deterministic shuffle] → pack → sorted partitioned
    write with manifest/resume — as ONE ray-job-submit job."""
    args._owns_ray = _ensure_ray(args.num_cpus)
    from .pipelines.training_prep import training_prep
    from .sinks.partitioned import PartitionedSink
    from .sources import read_table
    docs = read_table(args.sf_dir, "documents",
                      columns=["doc_id", "text", "source"])
    sink = PartitionedSink(args.out, run_ts=args.run_ts,
                           num_partitions=args.num_partitions)
    out = training_prep(docs, sink, context_len=args.context_len,
                        neardup=not args.no_neardup, shuffle=args.shuffle,
                        resume=not args.no_resume)
    completed = sink.manifest.completed()
    print(json.dumps({
        "out": args.out,
        "n_exact_dropped": out["n_exact_dropped"],
        "n_near_dropped": out["n_near_dropped"],
        "partitions_written": len(out["entries"]),
        "partitions_total": len(completed),
        "rows": sum(e.rows for e in completed.values()),
        "manifest": sink.manifest.path,
    }))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="cardinalhq_otel_collector_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="flagship pipeline → partitioned sinks")
    pr.add_argument("--sf-dir", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--run-ts", type=float, default=1706078400.0,
                    help="fixed run timestamp for partition dirs (never wall clock)")
    pr.add_argument("--num-partitions", type=int, default=16)
    pr.add_argument("--no-resume", action="store_true")
    pr.add_argument("--num-cpus", type=int, default=None)
    pr.set_defaults(fn=cmd_run)

    ps = sub.add_parser("spec", help="compile+run a YAML/JSON pipeline spec")
    ps.add_argument("--spec", required=True)
    ps.add_argument("--sf-dir", required=True)
    ps.add_argument("--out", required=True)
    ps.add_argument("--num-cpus", type=int, default=None)
    ps.set_defaults(fn=cmd_spec)

    pp = sub.add_parser("prep", help="composed training-data prep job "
                        "(dedup → quality → split → pack → sorted write)")
    pp.add_argument("--sf-dir", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--run-ts", type=float, default=1706078400.0)
    pp.add_argument("--num-partitions", type=int, default=16,
                    help="sink range partitions per route")
    pp.add_argument("--context-len", type=int, default=2048)
    pp.add_argument("--no-neardup", action="store_true")
    pp.add_argument("--shuffle", action="store_true",
                    help="pack per shard in deterministic shuffled order")
    pp.add_argument("--no-resume", action="store_true")
    pp.add_argument("--num-cpus", type=int, default=None)
    pp.set_defaults(fn=cmd_prep)

    pq_ = sub.add_parser("query", help="run a registered operator query")
    pq_.add_argument("--name", required=True)
    pq_.add_argument("--sf-dir", required=True)
    pq_.add_argument("--out", default=None,
                     help="parquet output path (prints a preview if omitted)")
    pq_.add_argument("--num-cpus", type=int, default=None)
    pq_.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    rc = args.fn(args)
    if getattr(args, "_owns_ray", False):
        import ray
        if ray.is_initialized():
            ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
