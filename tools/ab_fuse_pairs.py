"""Interleaved A/B: candidate-pair checkpoint vs fuse_pairs at the scaling
config (scale 0.012, 8 cores, synthetic dictionary with 8000 entities —
exactly bench_scaling.py's corpus, so walls are comparable to
BENCH/BASELINE.md). Fresh workdir per run; alternating order so host noise
(±30%, see BENCH/BASELINE.md) cancels in the medians.

Usage: python tools/ab_fuse_pairs.py [--reps 2] [--scale 0.012] [--cpus 8]
Writes one JSON line per run to stdout and a summary at the end.
"""
import argparse
import json
import shutil
import statistics
import subprocess
import sys


def run_once(fused: bool, scale: float, cpus: int, rep: int) -> dict:
    workdir = f"/tmp/ab_fuse_{'f' if fused else 'c'}_{rep}"
    shutil.rmtree(workdir, ignore_errors=True)
    cmd = [
        sys.executable, "-m", "pilsner_spark.plans.pipeline",
        "--scale", str(scale), "--cpus", str(cpus), "--workdir", workdir,
        "--dictionary", "synthetic", "--entities", "8000", "--seed", "42",
        "--skip-eval",  # timing-only: result parity is pinned by
        # tests/test_spark_pipeline.py::test_pipeline_fuse_pairs_parity
    ] + (["--fuse-pairs"] if fused else ["--no-fuse-pairs"])
    out = subprocess.run(
        cmd, capture_output=True, text=True,
        env={**__import__("os").environ, "SPARK_DRIVER_MEMORY": "16g"},
    )
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"run failed (fused={fused} rep={rep})")
    r = json.loads(out.stdout.strip().splitlines()[-1])
    shutil.rmtree(workdir, ignore_errors=True)
    row = {
        "fused": fused,
        "rep": rep,
        "wall": r["wall_seconds"],
        "pairs": r["pairs_scored"],
        "stage_walls": {k: v.get("wall_seconds") for k, v in r["stages"].items()},
    }
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--scale", type=float, default=0.012)
    p.add_argument("--cpus", type=int, default=8)
    args = p.parse_args()
    runs = []
    for rep in range(args.reps):
        for fused in (False, True) if rep % 2 == 0 else (True, False):
            runs.append(run_once(fused, args.scale, args.cpus, rep))
    summary = {}
    for fused in (False, True):
        walls = [r["wall"] for r in runs if r["fused"] == fused]
        summary["fused" if fused else "checkpointed"] = {
            "median_wall": statistics.median(walls),
            "walls": walls,
        }
    assert len({r["pairs"] for r in runs}) == 1
    summary["pairs"] = runs[0]["pairs"]
    summary["speedup"] = round(
        summary["checkpointed"]["median_wall"] / summary["fused"]["median_wall"], 3
    )
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
