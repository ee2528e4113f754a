"""Scale-posture datapoint above sf1 (VERDICT r5 ask #9).

Builds the index at two DATA sizes (default 1.2M and 4.8M transcript turns
— sf1 and sf4) in one interleave-free window at fixed parallelism, and
reports per-stage wall time plus the manifest's per-partition layout
(postings bytes / blocks per file: max and median) at both sizes. The
claim evidenced: per-stage wall grows ~linearly with data (constant
throughput) and per-partition volume grows ~data/N — i.e. a 1000-executor
cluster at 100 TB sees the same per-executor working set as this box does
at sf4/32, because every stage is partition-parallel with no driver-side
or single-partition accumulation.

Usage: python scripts/scale_posture.py [turns_small] [turns_big] [cores]
Writes BENCH/SCALE_POSTURE_r6.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_at(spark, turns: int, cores: int) -> dict:
    from blacklab_spark.build import IndexPaths, build_index
    from blacklab_spark.datagen import make_transcripts

    pdf = make_transcripts(turns, seed=42)
    df = spark.createDataFrame(pdf).repartition(cores * 4).persist()
    df.count()
    d = tempfile.mkdtemp(prefix="blscale_")
    t0 = time.time()
    build_index(spark, df, d)
    wall = time.time() - t0
    paths = IndexPaths(d)
    stages = {}
    for st in ("docs", "stats", "term_dict", "postings", "manifest"):
        m = paths.marker(st)
        if os.path.exists(m):
            with open(m) as f:
                stages[st] = round(json.load(f)["wall_sec"], 2)
    man = spark.read.parquet(paths.manifest).collect()
    per_file_bytes = sorted(int(r["bytes_compressed"]) for r in man)
    per_file_blocks = sorted(int(r["blocks_written"]) for r in man)
    postings_total = sum(int(r["postings_written"]) for r in man)
    df.unpersist()
    shutil.rmtree(d, ignore_errors=True)
    return {
        "turns": turns,
        "wall_sec": round(wall, 2),
        "tps": round(turns / wall),
        "stages": stages,
        "n_files": len(per_file_bytes),
        "bytes_max": per_file_bytes[-1],
        "bytes_median": int(statistics.median(per_file_bytes)),
        "bytes_total": sum(per_file_bytes),
        "blocks_max": per_file_blocks[-1],
        "postings_total": postings_total,
    }


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 4_800_000
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from blacklab_spark.session import get_spark

    import bench

    spark = get_spark("scale-posture", cores=cores,
                      shuffle_partitions=cores)
    build_at(spark, 240_000, cores)  # untimed warmup: JVM JIT + py workers
    probes = [(bench._cpu_probe(), bench._membw_probe())]

    def best(a, b):
        if a is None:
            return b
        pick = a if a["wall_sec"] <= b["wall_sec"] else b
        pick = dict(pick)
        pick["stages"] = {
            st: min(a["stages"].get(st, 1e9), b["stages"].get(st, 1e9))
            for st in a["stages"]
        }
        return pick

    rs = rb = None
    for _ in range(int(os.environ.get("BENCH_REPEATS", "2"))):
        rs = best(rs, build_at(spark, n_small, cores))
        probes.append((bench._cpu_probe(), bench._membw_probe()))
        rb = best(rb, build_at(spark, n_big, cores))
        probes.append((bench._cpu_probe(), bench._membw_probe()))
    ratio = n_big / n_small

    def row(st):
        s, b = rs["stages"].get(st), rb["stages"].get(st)
        if s is None or b is None:
            return None
        return (f"| {st} | {s:.2f} | {b:.2f} | {b / s:.2f}x | "
                f"{'~linear' if b / s <= ratio * 1.3 else 'SUPERLINEAR'} |")

    lines = [
        "# BENCH/SCALE_POSTURE_r6.md — build posture above sf1",
        "",
        f"One local[{cores}] window; 240k warmup build then small/big "
        f"interleaved, per-stage best-of (drift guard). "
        f"{n_small / 1e6:.1f}M vs "
        f"{n_big / 1e6:.1f}M turns ({ratio:.0f}x data). Probes "
        f"(cpu Mops, membw GB/s) around each build: {probes}.",
        "",
        f"| stage | {n_small // 1000}k s | {n_big // 1000}k s | growth "
        f"(data {ratio:.0f}x) | verdict |",
        "|---|---|---|---|---|",
    ]
    for st in ("docs", "stats", "term_dict", "postings", "manifest"):
        r = row(st)
        if r:
            lines.append(r)
    lines += [
        f"| **total** | {rs['wall_sec']} | {rb['wall_sec']} | "
        f"{rb['wall_sec'] / rs['wall_sec']:.2f}x | "
        f"tps {rs['tps']} -> {rb['tps']} |",
        "",
        "Per-partition postings layout (the manifest's per-file metrics — "
        "the per-executor working set a cluster would see):",
        "",
        "| metric | small | big | growth |",
        "|---|---|---|---|",
    ]
    for key in ("n_files", "bytes_median", "bytes_max", "bytes_total",
                "blocks_max", "postings_total"):
        lines.append(
            f"| {key} | {rs[key]} | {rb[key]} | {rb[key] / max(rs[key], 1):.2f}x |"
        )
    lines += [
        "",
        "Reading: stage walls growing ~data-ratio at fixed cores = constant "
        "throughput (no superlinear stage); per-file median bytes growing "
        "~data-ratio with n_files fixed = partition volume tracks data/N, "
        "so holding per-partition size constant at 100 TB is a matter of "
        "raising num_partitions proportionally (build_index exposes it), "
        "not an engine change. bytes_max/bytes_median bounds the skew the "
        "salted encode leaves behind.",
        "",
        "```json",
        json.dumps(rs), json.dumps(rb),
        "```",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out = os.path.join(REPO, "BENCH", "SCALE_POSTURE_r6.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"small": rs, "big": rb}))


if __name__ == "__main__":
    main()
