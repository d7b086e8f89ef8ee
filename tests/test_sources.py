"""Source formats: parquet (block sizing), JSONL, plain text + parse chain."""

import json

import pyarrow as pa

from cardinalhq_otel_collector_ray.sources.parquet import read_table
from cardinalhq_otel_collector_ray.sources.textjson import (
    read_jsonl, read_text_lines)
from cardinalhq_otel_collector_ray.stages.parse import ParseRule, parse_stage


def test_read_table_prunes_columns(sf_dir):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    assert set(ds.schema().names) == {"doc_id", "lang"}


def test_read_jsonl(tmp_path):
    p = tmp_path / "logs.jsonl"
    with open(p, "w") as f:
        for i in range(10):
            f.write(json.dumps({"level": "INFO" if i % 2 else "ERROR",
                                "msg": f"event {i}"}) + "\n")
    ds = read_jsonl(str(p))
    df = ds.to_pandas()
    assert len(df) == 10 and set(df.columns) == {"level", "msg"}


def test_read_text_with_parse_chain(tmp_path):
    p = tmp_path / "app.log"
    with open(p, "w") as f:
        for i in range(20):
            lvl = "ERROR" if i % 5 == 0 else "INFO"
            f.write(f"{lvl} code={i} msg=something happened\n")
    ds = read_text_lines(str(p))
    parsed = parse_stage(ds, [ParseRule(
        "text", r"^(?P<level>DEBUG|INFO|WARN|ERROR) code=(?P<code>\d+)")])
    df = parsed.to_pandas()
    assert len(df) == 20
    assert (df["level"] == "ERROR").sum() == 4
    # streaming execution does not guarantee row order — compare as a set
    assert sorted(df["code"].astype(int)) == list(range(20))


def test_cli_run_subprocess(sf_dir, tmp_path):
    """The ray-job-submit surface: CLI owns its session in a fresh process."""
    import json
    import subprocess
    import sys
    out = str(tmp_path / "cli")
    proc = subprocess.run(
        [sys.executable, "-m", "cardinalhq_otel_collector_ray.cli", "run",
         "--sf-dir", sf_dir, "--out", out, "--num-cpus", "4",
         "--num-partitions", "4"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-1500:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["rows"] == 500 and res["partitions_total"] > 0


def test_cli_query_subprocess(sf_dir, tmp_path):
    """`query` subcommand: run any driver-contract query standalone."""
    import json
    import subprocess
    import sys
    out = str(tmp_path / "q.parquet")
    proc = subprocess.run(
        [sys.executable, "-m", "cardinalhq_otel_collector_ray.cli", "query",
         "--name", "count_by_type", "--sf-dir", sf_dir, "--out", out,
         "--num-cpus", "4"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-1500:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["out"] == out
    import duckdb
    assert duckdb.sql(
        f"SELECT count(*) FROM '{out}/*.parquet'").fetchone()[0] == 5
    # unknown name → clean error, not a traceback
    proc2 = subprocess.run(
        [sys.executable, "-m", "cardinalhq_otel_collector_ray.cli", "query",
         "--name", "nope", "--sf-dir", sf_dir, "--num-cpus", "4"],
        capture_output=True, text=True, timeout=240, cwd="/root/repo")
    assert proc2.returncode == 2 and "unknown query" in proc2.stderr


def test_cli_prep_subprocess(sf_dir, tmp_path):
    """`prep` subcommand: the composed training-data job as a
    ray-job-submit surface, with resume on a rerun."""
    import json
    import subprocess
    import sys
    out = str(tmp_path / "prep")
    cmd = [sys.executable, "-m", "cardinalhq_otel_collector_ray.cli",
           "prep", "--sf-dir", sf_dir, "--out", out, "--num-cpus", "4",
           "--num-partitions", "2", "--no-neardup", "--shuffle"]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                          cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-1500:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["rows"] > 0 and res["partitions_written"] > 0
    # rerun resumes: nothing rewritten, totals unchanged
    proc2 = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                           cwd="/root/repo")
    assert proc2.returncode == 0, proc2.stderr[-1500:]
    res2 = json.loads(proc2.stdout.strip().splitlines()[-1])
    assert res2["partitions_written"] == 0
    assert res2["rows"] == res["rows"]


def test_read_csv(tmp_path):
    from cardinalhq_otel_collector_ray.sources.textjson import read_csv
    p = tmp_path / "rows.csv"
    with open(p, "w") as f:
        f.write("doc_id,level,n\n")
        for i in range(12):
            f.write(f"{i},{'INFO' if i % 3 else 'ERROR'},{i * 10}\n")
    df = read_csv(str(p)).to_pandas()
    assert len(df) == 12
    assert set(df.columns) == {"doc_id", "level", "n"}
    assert df["n"].dtype.kind == "i"          # schema inferred as ints
    assert (df["level"] == "ERROR").sum() == 4


def test_spec_file_sources(tmp_path):
    """Declarative file sources: jsonl/text/csv feed the same stage
    vocabulary as parquet (filelogreceiver analog)."""
    from cardinalhq_otel_collector_ray.pipelines.spec import compile_pipeline
    p = tmp_path / "app.log"
    with open(p, "w") as f:
        for i in range(15):
            lvl = "ERROR" if i % 5 == 0 else "INFO"
            f.write(f"{lvl} code={i} msg=x\n")
    out = compile_pipeline({
        "source": {"kind": "text", "path": "app.log"},
        "stages": [
            {"kind": "parse_regex", "column": "text",
             "pattern": r"^(?P<level>INFO|ERROR) code=(?P<code>\d+)"},
            {"kind": "drop_where", "column": "level", "equals": "INFO"},
        ]}, str(tmp_path)).to_pandas()
    assert len(out) == 3 and (out["level"] == "ERROR").all()

    c = tmp_path / "rows.csv"
    with open(c, "w") as f:
        f.write("doc_id,n\n")
        for i in range(8):
            f.write(f"{i},{i * 2}\n")
    out = compile_pipeline({
        "source": {"kind": "csv", "path": str(c), "columns": ["n"]},
        "stages": []}, str(tmp_path)).to_pandas()
    assert out["n"].tolist() == [i * 2 for i in range(8)]
