"""Per-partition lineage manifests + resumable job driver.

The resumability contract (north_rule: "resumable from checkpoint with
per-partition lineage + metrics"):

* The unit of checkpointing is a **shard group** — a fixed slice of the
  sorted input file list.  Group identity is a pure function of the
  input listing, so a restarted job computes the same groups.
* Each group's output lands under ``out_dir/shard=NNNNN/`` and is made
  visible *atomically*: results are written to a temp directory and
  renamed into place, then a one-line JSON lineage record
  (input files, row count, record count, content-hash rollup, wall
  time, throughput) is written to ``out_dir/_manifest/NNNNN.json`` via
  the same write-temp-then-rename dance.  A crash mid-group leaves no
  manifest entry, so the group reruns from scratch; finished groups are
  skipped on resume without touching their data.
* Identity/ordering of *rows* inside a group doesn't matter — the
  north-rule invariant is per-url, and extraction is deterministic.

At 100 TB the same layout holds: groups of ~N parquet shards each are
sized so one group ≈ one streaming-executor run of a few minutes, and a
killed ``ray job submit`` re-run skips completed groups by listing one
small manifest directory.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow.compute as pc

from ..pipelines.extract import build_extraction_pipeline, read_pages


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def list_shard_groups(input_dir: str, group_size: int) -> list[list[str]]:
    files = sorted(
        os.path.join(input_dir, f)
        for f in os.listdir(input_dir)
        if f.endswith(".parquet")
    )
    return [files[i : i + group_size] for i in range(0, len(files), group_size)]


def completed_groups(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.endswith(".json") and not name.startswith("_"):
            try:
                done.add(int(name[:-5]))
            except ValueError:
                continue
    return done


def _jsonl_group_stats(tmp_dir: str) -> tuple[int, int, int]:
    """Lineage stats over a group's JSONL output.  JSON has no column
    pruning, so each file is line-scanned by a Ray task (the driver
    only collects three ints per file, never the data)."""
    import ray

    @ray.remote
    def stat_file(path: str) -> tuple[int, int, int]:
        rows = n_records = rollup = 0
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                rec = json.loads(line)
                rows += 1
                n_records += int(rec.get("n_records") or 0)
                rollup ^= int(str(rec["content_sha256"])[:16], 16)
        return rows, n_records, rollup

    paths = [
        os.path.join(tmp_dir, n)
        for n in sorted(os.listdir(tmp_dir))
        if n.endswith(".json")
    ]
    rows = n_records = rollup = 0
    for r, nr, h in ray.get([stat_file.remote(p) for p in paths]):
        rows += r
        n_records += nr
        rollup ^= h
    return rows, n_records, rollup


def run_job(
    input_dir: str,
    out_dir: str,
    *,
    group_size: int = 8,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 64,
    size_routing_threshold: int | None = None,
    output_format: str = "parquet",
) -> dict:
    """Run (or resume) the extraction job over a directory of pages
    parquet shards.  Returns a summary with per-group metrics.

    ``size_routing_threshold`` switches to the byte-size-aware plan
    (giant rows on a dedicated 1-row-per-task branch, see
    stages/skew.py) — use for corpora with multi-hundred-MB documents.

    ``output_format="jsonl"`` writes newline-delimited JSON instead of
    parquet — the reference service's native output shape (app.py
    returns a JSON record array per document).  Parquet remains the
    at-scale sink: JSONL lineage stats can't column-prune, so each
    output file is line-scanned by a Ray task.  Nested record/span
    columns serialize as JSON objects either way."""
    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)
    # sweep tmp dirs left by crashed writes — resume only trusts
    # manifests, so these are dead weight that would otherwise
    # accumulate a fresh uuid-suffixed dir per crashed rerun
    import shutil

    for name in os.listdir(out_dir):
        if name.startswith("_tmp.shard="):
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)
    groups = list_shard_groups(input_dir, group_size)
    done = completed_groups(out_dir)

    summary: dict = {"groups": len(groups), "skipped": 0, "ran": [], "rows": 0}
    for gid, files in enumerate(groups):
        if gid in done:
            summary["skipped"] += 1
            continue
        t0 = time.perf_counter()
        if size_routing_threshold is not None:
            from ..stages.skew import extract_with_size_routing

            ds = extract_with_size_routing(
                read_pages(files),
                threshold_bytes=size_routing_threshold,
                small_batch_size=batch_size,
            )
        else:
            ds = build_extraction_pipeline(
                read_pages(files), concurrency=concurrency, batch_size=batch_size
            )

        final_dir = os.path.join(out_dir, f"shard={gid:05d}")
        tmp_dir = os.path.join(out_dir, f"_tmp.shard={gid:05d}.{uuid.uuid4().hex[:8]}")
        # the heavy write is distributed (workers stream blocks straight
        # to parquet/json); the driver never materializes the data
        if output_format == "jsonl":
            ds.write_json(tmp_dir)
            rows, n_records, hash_rollup = _jsonl_group_stats(tmp_dir)
        else:
            ds.write_parquet(tmp_dir)

            # lineage stats from the written files' narrow columns only
            import pyarrow.parquet as pq

            rows = 0
            n_records = 0
            hash_rollup = 0
            for name in sorted(os.listdir(tmp_dir)):
                if not name.endswith(".parquet"):
                    continue
                t = pq.read_table(
                    os.path.join(tmp_dir, name),
                    columns=["n_records", "content_sha256"],
                )
                rows += t.num_rows
                n_records += pc.sum(t.column("n_records")).as_py() or 0
                # order-insensitive rollup of per-row content hashes
                for h in t.column("content_sha256").to_pylist():
                    hash_rollup ^= int(h[:16], 16)
        if os.path.isdir(final_dir):
            import shutil

            shutil.rmtree(final_dir)
        os.replace(tmp_dir, final_dir)

        wall = time.perf_counter() - t0
        in_bytes = sum(os.path.getsize(f) for f in files)
        _atomic_write_json(
            os.path.join(out_dir, "_manifest", f"{gid:05d}.json"),
            {
                "group": gid,
                "input_files": [os.path.basename(f) for f in files],
                "input_bytes": in_bytes,
                "rows": rows,
                "records": n_records,
                "content_hash_rollup": f"{hash_rollup:016x}",
                "wall_sec": round(wall, 4),
                "rows_per_sec": round(rows / wall, 2) if wall > 0 else None,
                "mb_per_sec": round(in_bytes / wall / 1e6, 3) if wall > 0 else None,
            },
        )
        summary["ran"].append(gid)
        summary["rows"] += rows
    return summary
