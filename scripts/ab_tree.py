"""Interleaved same-host A/B of bench keys between two trees.

Usage:
    python scripts/ab_tree.py --base /tmp/r13tree [--main /root/repo]
        [--keys k1,k2] [--rounds 3] [--sf DIR]

Each trial is a FRESH process (fork via subprocess) so both trees get
an identical cold JVM; trials alternate main→base→main→base so a
host-state window hits both samples (the r13 interleaving discipline —
single-shot numbers on this host are unusable). Per key, prints each
trial and the median per tree plus the ratio.

The child runs with the tree FIRST on sys.path and asserts the package
actually resolved from that tree (the r13 worktree trap: scripts that
sys.path.insert the main repo silently A/B main against main).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
tree = sys.argv[1]
keys = sys.argv[2].split(",")
sf = sys.argv[3]
sys.path.insert(0, tree)
import component_delta_lake_writer_spark as pkg
assert pkg.__file__.startswith(tree), pkg.__file__
from component_delta_lake_writer_spark import get_spark
from component_delta_lake_writer_spark.plans import QUERIES
spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")
spark.range(1).count()
from pathlib import Path
for p in sorted(Path(sf).glob("*.parquet")):
    with open(p, "rb") as fh:
        while fh.read(1 << 22):
            pass
    spark.read.parquet(str(p)).count()
out = {}
for key in keys:
    t0 = time.perf_counter()
    n = QUERIES[key](spark, sf).count()
    out[key] = round(time.perf_counter() - t0, 3)
print("ABRESULT " + json.dumps(out))
"""


def run_tree(tree: str, keys: list[str], sf: str) -> dict[str, float]:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, "-c", CHILD, tree, ",".join(keys), sf],
        capture_output=True, text=True, env=env, timeout=900,
    )
    for line in r.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"A/B child on {tree} produced no result:\n{r.stdout[-2000:]}"
        f"\n{r.stderr[-2000:]}"
    )


def main() -> None:
    args = sys.argv[1:]

    def opt(name: str, default: str) -> str:
        return args[args.index(name) + 1] if name in args else default

    base = opt("--base", "/tmp/r13tree")
    main_tree = opt("--main", "/root/repo")
    keys = opt("--keys", "minhash_dedup").split(",")
    rounds = int(opt("--rounds", "3"))
    sf = opt("--sf", os.environ.get("SPARK_GRAFT_SF_DIR",
                                    "/root/testdata/sf0.1"))

    loads = os.getloadavg()
    print(f"# loadavg {loads[0]:.2f} sf={sf} rounds={rounds}")
    main_runs: list[dict] = []
    base_runs: list[dict] = []
    for i in range(rounds):
        main_runs.append(run_tree(main_tree, keys, sf))
        base_runs.append(run_tree(base, keys, sf))
        print(f"# round {i}: main={main_runs[-1]} base={base_runs[-1]}")
    print(f"{'key':40s} {'main_med':>9s} {'base_med':>9s} {'speedup':>8s}")
    for k in keys:
        m = statistics.median(r[k] for r in main_runs)
        b = statistics.median(r[k] for r in base_runs)
        print(f"{k:40s} {m:9.3f} {b:9.3f} {b / m:8.2f}x")


if __name__ == "__main__":
    main()
