"""Stage-level build-path scaling profile (VERDICT r5 ask #2).

Runs the index BUILD alone at two parallelism levels (default local[2] vs
local[8]), interleaved round-robin with CPU + DRAM-bandwidth probes, and
breaks the wall time down by build stage (docs = tokenize+docmap fused pass,
stats, term_dict, postings encode) from the per-stage checkpoint markers the
build already writes (build.py _mark_stage). Output: BENCH/<out>.md with a
per-stage efficiency table — pinning WHICH stage stops scaling, which is the
evidence the cluster-shape argument needs (a DRAM-ceiling stage on this
single-socket sandbox is exactly the stage that scales fine across real
executors with their own memory controllers).

Usage: python scripts/profile_build_scaling.py [n_small] [n_big] [turns]
Env: BENCH_REPEATS (default 3), BENCH_PROBE_FLOOR / BENCH_MEMBW_FLOOR
(probe gates, default off), BENCH_SCALING_OUT (default SCALING_build.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
PROBE_FLOOR = float(os.environ.get("BENCH_PROBE_FLOOR", "0"))
MEMBW_FLOOR = float(os.environ.get("BENCH_MEMBW_FLOOR", "0"))
PROBE_RETRIES = int(os.environ.get("BENCH_PROBE_RETRIES", "2"))

_BUILD_PROG = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from blacklab_spark.session import get_spark
from blacklab_spark.build import IndexPaths, build_index
from blacklab_spark.datagen import make_transcripts

cpus = int(sys.argv[1]); turns = int(sys.argv[2])
spark = get_spark("profile-build", cores=cpus, shuffle_partitions=max(cpus, 8))
pdf = make_transcripts(turns, seed=42)
transcripts = spark.createDataFrame(pdf).repartition(max(cpus, 8)).persist()
transcripts.count()
best = None
for i in range(2):  # second build has a hot JVM/python-worker pool
    d = tempfile.mkdtemp(prefix="blprof_")
    t0 = time.time()
    build_index(spark, transcripts, d, salt_df_threshold=10_000,
                docs_per_salt=1 << 16)
    wall = time.time() - t0
    paths = IndexPaths(d)
    stages = {{}}
    for st in ("docs", "stats", "term_dict", "postings", "manifest"):
        m = paths.marker(st)
        if os.path.exists(m):
            with open(m) as f:
                stages[st] = round(json.load(f)["wall_sec"], 3)
    shutil.rmtree(d, ignore_errors=True)
    if best is None or wall < best["build_sec"]:
        best = {{"build_sec": round(wall, 3), "stages": stages}}
print("PROFILE_JSON:" + json.dumps(best))
"""


def probes():
    import bench

    return bench._cpu_probe(), bench._membw_probe()


def run_once(cpus: int, turns: int) -> dict:
    import time

    for attempt in range(PROBE_RETRIES + 1):
        p0, m0 = probes()
        degraded = (PROBE_FLOOR and p0 < PROBE_FLOOR) or (
            MEMBW_FLOOR and m0 < MEMBW_FLOOR
        )
        if degraded and attempt < PROBE_RETRIES:
            print(f"# degraded window (cpu {p0} Mops, membw {m0} GB/s), "
                  f"attempt {attempt + 1} — retrying", file=sys.stderr)
            time.sleep(10)
            continue
        # last attempt runs regardless; `clean` records the verdict
        out = subprocess.run(
            [sys.executable, "-c", _BUILD_PROG.format(repo=REPO),
             str(cpus), str(turns)],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines()
                if l.startswith("PROFILE_JSON:")]
        if not line:
            print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
            raise RuntimeError("build profile run produced no JSON")
        r = json.loads(line[-1][len("PROFILE_JSON:"):])
        p1, m1 = probes()
        r["probes"] = {"cpu": [p0, p1], "membw": [m0, m1]}
        r["clean"] = (not PROBE_FLOOR or min(p0, p1) >= PROBE_FLOOR) and (
            not MEMBW_FLOOR or min(m0, m1) >= MEMBW_FLOOR
        )
        return r
    raise AssertionError("unreachable: last attempt always runs")


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    turns = int(sys.argv[3]) if len(sys.argv) > 3 else 120_000
    factor = n_big / n_small

    runs: dict[int, list[dict]] = {n_small: [], n_big: []}
    for _ in range(REPEATS):
        for c in (n_small, n_big):
            runs[c].append(run_once(c, turns))
    best = {c: min(rs, key=lambda r: r["build_sec"]) for c, rs in runs.items()}
    # per-stage best-of as well (stages are independent timings)
    stage_best = {
        c: {
            st: min(r["stages"].get(st, float("inf")) for r in rs)
            for st in best[c]["stages"]
        }
        for c, rs in runs.items()
    }

    lines = [
        f"# BENCH/{os.environ.get('BENCH_SCALING_OUT', 'SCALING_build.md')} — "
        "stage-level build scaling",
        "",
        f"Index build of {turns} transcript turns at local[{n_small}] vs "
        f"local[{n_big}] ({factor:.0f}x cores), {REPEATS} interleaved repeats, "
        "per-stage best-of (probe-bracketed; floors "
        f"cpu={PROBE_FLOOR or 'off'} Mops, membw={MEMBW_FLOOR or 'off'} GB/s).",
        "",
        f"| stage | local[{n_small}] s | local[{n_big}] s | speedup | efficiency |",
        "|---|---|---|---|---|",
    ]
    for st in stage_best[n_small]:
        s, b = stage_best[n_small][st], stage_best[n_big].get(st)
        if not b or b == float("inf"):
            continue
        sp = s / b if b else float("nan")
        lines.append(
            f"| {st} | {s:.2f} | {b:.2f} | {sp:.2f}x | **{sp / factor:.2f}** |"
        )
    ts, tb = best[n_small]["build_sec"], best[n_big]["build_sec"]
    lines += [
        f"| **total** | {ts:.2f} | {tb:.2f} | {ts / tb:.2f}x | "
        f"**{ts / tb / factor:.2f}** |",
        "",
        "Probes per accepted run:",
        "```json",
        json.dumps({str(c): [r.get("probes") for r in rs] for c, rs in runs.items()}),
        "```",
        "",
        "Raw best runs:",
        "```json",
        json.dumps(best[n_small]), json.dumps(best[n_big]),
        "```",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_name = os.environ.get("BENCH_SCALING_OUT", "SCALING_build.md")
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({
        "stages_small": stage_best[n_small], "stages_big": stage_best[n_big],
        "total": [ts, tb], "total_eff": round(ts / tb / factor, 3),
    }))


if __name__ == "__main__":
    main()
