"""Interleaved A/B benchmark: the CURRENT commit vs a BASELINE commit,
alternated run-by-run on the same host, so co-tenant host noise lands
on both arms equally and cross-round deltas are self-controlled.

Usage:
    python ab_bench.py --baseline 911a678 --rounds 3

For each round r: run bench.py at HEAD (arm A), then bench.py in a git
worktree pinned to the baseline commit (arm B).  Per arm, per query,
the BEST of the rounds is kept (same best-of-N convention as the
driver's bench harness); the comparable subset is the round-1 query
set (q1..q10 without the q5b/c/d additions).

Writes BENCH/AB.json and prints a markdown table for BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

COMPARABLE = [
    "q1_term_hot", "q2_term_mid", "q3_and", "q4_or_hot", "q5_phrase",
    "q6_prefix", "q7_sql64_bool", "q8_dismax", "q9_minhash_dedup",
    "q10_ann_cosine",
]


def run_bench(cwd: str, env: dict) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1800,
    )
    last = [
        ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")
    ]
    if out.returncode != 0 or not last:
        raise RuntimeError(
            f"bench failed rc={out.returncode}: {out.stderr[-2000:]}"
        )
    return json.loads(last[-1])


def ensure_worktree(commit: str) -> str:
    path = f"/tmp/ab_worktree_{commit}"
    if not os.path.isdir(path):
        subprocess.run(
            ["git", "worktree", "add", "--detach", path, commit],
            cwd=REPO, check=True, capture_output=True,
        )
    return path


def best(results: list[dict]) -> dict:
    """Per-query min across rounds; build files/sec max."""
    queries: dict[str, float] = {}
    for r in results:
        for q, s in r.get("queries", {}).items():
            queries[q] = min(queries.get(q, float("inf")), s)
    fps = max(r["build"]["files_per_sec"] for r in results)
    comp = sum(queries[q] for q in COMPARABLE if q in queries)
    return {
        "queries": queries,
        "build_files_per_sec": fps,
        "comparable_subset_sec": round(comp, 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    args = ap.parse_args()

    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = args.sf_dir
    env["SPARK_GRAFT_CPUS"] = args.cpus

    wt = ensure_worktree(args.baseline)
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()

    a_runs, b_runs = [], []
    for i in range(args.rounds):
        print(f"[ab] round {i + 1}/{args.rounds} arm A (HEAD {head})",
              file=sys.stderr)
        a_runs.append(run_bench(REPO, env))
        print(f"[ab] round {i + 1}/{args.rounds} arm B ({args.baseline})",
              file=sys.stderr)
        b_runs.append(run_bench(wt, env))

    a, b = best(a_runs), best(b_runs)
    result = {
        "head": head,
        "baseline": args.baseline,
        "rounds": args.rounds,
        "sf": args.sf_dir,
        "cpus": args.cpus,
        "A": a,
        "B": b,
        "raw": {"A": a_runs, "B": b_runs},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "AB.json"), "w") as f:
        json.dump(result, f, indent=1)

    # markdown table
    qs = sorted(set(a["queries"]) & set(b["queries"]))
    lines = [
        f"| query | {args.baseline} (B) | {head} (A) | delta |",
        "|---|---|---|---|",
    ]
    for q in qs:
        bv, av = b["queries"][q], a["queries"][q]
        d = (av - bv) / bv * 100 if bv else 0.0
        lines.append(f"| {q} | {bv:.3f} | {av:.3f} | {d:+.0f}% |")
    lines.append(
        f"| **comparable subset** | {b['comparable_subset_sec']:.2f} |"
        f" {a['comparable_subset_sec']:.2f} | |"
    )
    lines.append(
        f"| **build files/s** | {b['build_files_per_sec']:.0f} |"
        f" {a['build_files_per_sec']:.0f} | |"
    )
    print("\n".join(lines))
    print(json.dumps({
        "metric": "ab_comparable_subset_sec",
        "A": a["comparable_subset_sec"],
        "B": b["comparable_subset_sec"],
        "A_build_fps": a["build_files_per_sec"],
        "B_build_fps": b["build_files_per_sec"],
    }))


if __name__ == "__main__":
    main()
