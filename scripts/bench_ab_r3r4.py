"""Same-window A/B: round-3 code vs HEAD on the two metrics BENCH_r04 flagged
as regressed (dedup_minhash 2.9x, build_synth100k 1.5x) — the round-4 verdict
asked for exactly this attribution run.

Method: a git worktree pinned at the round-3 commit supplies the r3 engine;
legs alternate r3 / HEAD in ONE window (fresh subprocess+JVM per leg, same
pre-materialized inputs), min-of-N per side, with boxmeter PhaseMeter
recording co-tenant load per leg so window quality is a measurement.

Run: python scripts/bench_ab_r3r4.py [r3_tree] [reps] [sf_dir]
Appends a JSON line to BENCH/ab_r3r4.jsonl.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))
from boxmeter import PhaseMeter  # noqa: E402

_WORKER = r"""
import json, sys, time, shutil, tempfile
root = sys.argv[1]
pages_path = sys.argv[2]
sf_dir = sys.argv[3]
sys.path.insert(0, root)
from webindex.session import get_spark
from webindex.build import build_index
from webindex.dedup import minhash_signatures, lsh_candidate_pairs

spark = get_spark(app="ab-leg", master="local[32]", shuffle_partitions=32)
out = {}

# dedup_minhash — bench.py's exact recipe
docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
    spark.sparkContext.defaultParallelism
)
t0 = time.monotonic()
sigs = minhash_signatures(docs, n_hashes=16)
lsh_candidate_pairs(sigs, n_bands=4).count()
out["dedup_minhash"] = time.monotonic() - t0

# build_synth100k — bench.py's exact recipe (one rep; parent does min-of-N)
synth = spark.read.parquet(pages_path)
workdir = tempfile.mkdtemp(prefix="ab_idx_")
t0 = time.monotonic()
build_index(spark, synth, text_col="html", doc_id_method="hash",
            out_dir=f"{workdir}/idx")
out["build_synth100k"] = time.monotonic() - t0
shutil.rmtree(workdir, ignore_errors=True)
print("ABRESULT " + json.dumps(out))
"""

_GEN = r"""
import sys
sys.path.insert(0, sys.argv[1])
from webindex.session import get_spark
from webindex.pagesgen import generate_pages_df
spark = get_spark(app="ab-gen", master="local[32]", shuffle_partitions=32)
generate_pages_df(spark, 100_000).write.mode("overwrite").parquet(sys.argv[2])
"""


def run_leg(root: str, pages: str, sf_dir: str) -> dict:
    with PhaseMeter() as m:
        p = subprocess.run(
            [sys.executable, "-c", _WORKER, root, pages, sf_dir],
            capture_output=True, text=True, timeout=1800,
        )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            r = json.loads(line[len("ABRESULT "):])
            r["cotenant_cores"] = round(m.cotenant_cores, 2)
            r["steal_cores"] = round(m.steal_cores, 2)
            return r
    raise RuntimeError(f"leg failed rc={p.returncode}\n{p.stderr[-3000:]}")


def main() -> None:
    r3_tree = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab_r3_tree"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    pages = tempfile.mkdtemp(prefix="ab_pages_") + "/pages_synth"
    subprocess.run([sys.executable, "-c", _GEN, str(REPO), pages],
                   check=True, capture_output=True, timeout=900)

    legs: dict[str, list[dict]] = {"r3": [], "head": []}
    for i in range(reps):
        for name, root in (("r3", r3_tree), ("head", str(REPO))):
            res = run_leg(root, pages, sf_dir)
            legs[name].append(res)
            print(f"leg {i} {name}: {json.dumps(res)}", flush=True)

    summary = {"reps": reps, "sf_dir": sf_dir, "legs": legs}
    for metric in ("dedup_minhash", "build_synth100k"):
        for name in ("r3", "head"):
            summary[f"{metric}_{name}_min"] = round(
                min(r[metric] for r in legs[name]), 3
            )
    out = REPO / "BENCH" / "ab_r3r4.jsonl"
    with out.open("a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps({k: v for k, v in summary.items() if k != "legs"}, indent=1))


if __name__ == "__main__":
    main()
