"""N-to-4N scaling record for classifier scoring (BENCH_SCALING.json
`clf` section): score_documents over sf0.1 documents replicated
CLF_MULT times (default 16 -> 80k docs, disjoint ids) with a 2^16
float weight vector, at local[2]/local[8]/local[32].  Warm + best-of-R
per level (fresh subprocess per run so each level gets its own JVM).

Usage: python tools/scale_clf.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
from pyspark.sql import functions as F
from tilegrab_spark import get_spark
from tilegrab_spark.operators.classifier import score_documents

cpus = int(os.environ["CLF_CPUS"])
mult = int(os.environ.get("CLF_MULT", "16"))
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 2),
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
if mult > 1:
    docs = (
        docs.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))))
        .withColumn("doc_id", F.col("doc_id") + F.col("_r").cast("long") * 10_000_000)
        .drop("_r")
    )
rng = np.random.default_rng(0)
w = rng.standard_normal(1 << 16)

def run():
    t0 = time.time()
    n = score_documents(docs, w).select(F.count("*"), F.sum("score")).collect()[0][0]
    return time.time() - t0, n

run()  # warm: JVM + page cache + broadcast machinery
results = [run() for _ in range(3)]
t = min(r[0] for r in results)
n = results[0][1]
print(json.dumps({"t": round(t, 3), "docs": n}))
"""


def main():
    mult = int(os.environ.get("CLF_MULT", "16"))
    levels = {}
    for cpus in (32, 8, 2):
        env = dict(os.environ, CLF_CPUS=str(cpus), CLF_MULT=str(mult))
        print(f"=== clf scoring at local[{cpus}] ===", file=sys.stderr, flush=True)
        out = subprocess.run(
            [sys.executable, "-c", "import json\n" + CHILD % {"repo": REPO}],
            capture_output=True, text=True, env=env, cwd=REPO,
        )
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            sys.exit(1)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        d = json.loads(line)
        d["docs_per_sec"] = round(d["docs"] / d["t"], 1)
        levels[str(cpus)] = d
        time.sleep(30)  # cool between levels

    def eff(lo, hi, f):
        return round((levels[hi]["docs_per_sec"] / levels[lo]["docs_per_sec"]) / f, 3)

    section = {
        "protocol": (
            "score_documents (2^16 float weights) over sf0.1 documents "
            f"replicated {mult}x (disjoint ids); warm + best-of-3 per "
            "level, fresh JVM per level, 30s cool-down between levels"
        ),
        "levels": levels,
        "efficiency": {"2_to_8": eff("2", "8", 4), "8_to_32": eff("8", "32", 4)},
    }
    path = os.path.join(REPO, "BENCH_SCALING.json")
    report = json.load(open(path))
    report["clf"] = section
    json.dump(report, open(path, "w"), indent=1)
    print(json.dumps(section, indent=1))


if __name__ == "__main__":
    main()
