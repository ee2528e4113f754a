"""Two-cluster-size scaling evidence (north_rule): run bench.py at N and 4N
cores (local[8] vs local[32] — no real cluster in this sandbox), report
throughput at both + scaling efficiency, write BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [n_small] [n_big] [turns]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
# probe gate (VERDICT r4 #4): a run whose bracketing CPU probes fall below
# this Mops floor ran in a degraded host window and is retried, not
# accepted — clean windows on this box probe ~125-140 Mops (BENCH_r04)
PROBE_FLOOR = float(os.environ.get("BENCH_PROBE_FLOOR", "0"))
PROBE_RETRIES = int(os.environ.get("BENCH_PROBE_RETRIES", "2"))


def run_once(cpus: int, turns: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["BENCH_TURNS"] = str(turns)
    for attempt in range(PROBE_RETRIES + 1):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        pr = r.get("probe", {})
        pmin = min(pr.get("before_mops", 0), pr.get("after_mops", 0))
        if not PROBE_FLOOR or pmin >= PROBE_FLOOR:
            return r
        print(f"# probe {pmin} < floor {PROBE_FLOOR} (cpus={cpus}, "
              f"attempt {attempt + 1}) — degraded window, retrying",
              file=sys.stderr)
    r["probe_below_floor"] = True
    return r


def run_interleaved(cpu_levels: list[int], turns: int) -> dict[int, dict]:
    """Alternate the two parallelism levels round-robin so this sandbox's
    multi-minute host-performance drift hits both levels equally, run warm
    builds (BENCH_BUILDS=2 → second build has hot JVM/python workers), and
    take per-level best-of — the standard unloaded-capacity estimator."""
    os.environ.setdefault("BENCH_BUILDS", "2")
    results: dict[int, list[dict]] = {c: [] for c in cpu_levels}
    for _ in range(REPEATS):
        for c in cpu_levels:
            results[c].append(run_once(c, turns))
    out = {}
    for c, runs in results.items():
        best = max(runs, key=lambda r: r["build"]["turns_per_sec"])
        best["queries"] = {
            k: min(r["queries"][k] for r in runs) for k in best["queries"]
        }
        best["all_build_tps"] = [r["build"]["turns_per_sec"] for r in runs]
        if all("concurrent" in r for r in runs):
            best["concurrent"] = max(
                (r["concurrent"] for r in runs), key=lambda x: x["qps"]
            )
        out[c] = best
    return out


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    turns = int(sys.argv[3]) if len(sys.argv) > 3 else 120_000
    factor = n_big / n_small

    both = run_interleaved([n_small, n_big], turns)
    small, big = both[n_small], both[n_big]

    b_s = small["build"]["turns_per_sec"]
    b_b = big["build"]["turns_per_sec"]
    build_eff = (b_b / b_s) / factor
    q_s = sum(small["queries"].values())
    q_b = sum(big["queries"].values())
    query_speedup = q_s / q_b if q_b else float("nan")
    query_eff = query_speedup / factor
    conc_eff = conc_speedup = None
    if "concurrent" in small and "concurrent" in big:
        # throughput metric: per-run best qps (bench best-of already applied
        # to queries; take max qps across runs per level)
        qps_s = small["concurrent"]["qps"]
        qps_b = big["concurrent"]["qps"]
        conc_speedup = qps_b / qps_s
        conc_eff = conc_speedup / factor

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_name = os.environ.get("BENCH_SCALING_OUT", "SCALING.md")
    lines = [
        f"# BENCH/{out_name} — two-parallelism scaling evidence",
        "",
        f"Same job (index build of {turns} transcript turns + BM25 query set)",
        f"run at local[{n_small}] and local[{n_big}] (N vs {factor:.0f}N cores; the sandbox",
        "has no real cluster — per BASELINE.md this stands in for N vs 4N executors).",
        "",
        "| metric | local[{}] | local[{}] | speedup | efficiency |".format(n_small, n_big),
        "|---|---|---|---|---|",
        f"| build throughput (turns/sec) | {b_s:,.0f} | {b_b:,.0f} | {b_b / b_s:.2f}x | **{build_eff:.2f}** |",
        f"| query set wall (sec, {len(small['queries'])} queries) | {q_s:.2f} | {q_b:.2f} | {query_speedup:.2f}x | **{query_eff:.2f}** |",
        *(
            [f"| concurrent query throughput (qps, {small['concurrent']['n_queries']} queries) | "
             f"{small['concurrent']['qps']:.2f} | {big['concurrent']['qps']:.2f} | "
             f"{conc_speedup:.2f}x | **{conc_eff:.2f}** |"]
            if conc_eff is not None else []
        ),
        "",
        f"Probe-bracketed (floor {PROBE_FLOOR or 'off'} Mops): "
        f"local[{n_small}] {small.get('probe')} · "
        f"local[{n_big}] {big.get('probe')}"
        + (" — **a level stayed below the floor after retries**"
           if small.get("probe_below_floor") or big.get("probe_below_floor")
           else ""),
        "",
        "Per-query seconds:",
        "",
        "| query | local[{}] | local[{}] |".format(n_small, n_big),
        "|---|---|---|",
    ]
    for k in small["queries"]:
        lines.append(f"| {k} | {small['queries'][k]:.3f} | {big['queries'][k]:.3f} |")
    lines += [
        "",
        "Raw JSON:",
        "```json",
        json.dumps(small),
        json.dumps(big),
        "```",
        "",
        "Efficiency = (throughput_big / throughput_small) / (cores_big / cores_small).",
        "Target (BASELINE.json): >= 0.8 on the build path.",
    ]
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({
        "build_eff": round(build_eff, 3), "query_eff": round(query_eff, 3),
        "build_tps": [b_s, b_b], "query_wall": [q_s, q_b],
        **({"conc_eff": round(conc_eff, 3),
            "conc_qps": [small["concurrent"]["qps"], big["concurrent"]["qps"]]}
           if conc_eff is not None else {}),
    }))


if __name__ == "__main__":
    main()
