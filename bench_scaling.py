"""Scaling-efficiency evidence (north rule: throughput efficiency >=0.8
from N to 4N executors; sandbox proxy per the driver instruction — the
same job on the same input at two local parallelism levels).

Runs bench.py as a subprocess at several core counts (largest first so
the cached image table is generated at full parallelism), computes
per-stage and combined throughput scaling efficiencies for the scalable
stages, and writes BENCH_SCALING.json. A hardware-calibration pass
(pure-kernel multiprocessing, no Spark) separates Spark's scaling from
the box's own per-core throughput falloff when saturated — a single-node
artifact that adding real 4N executor MACHINES does not have.

Usage: python bench_scaling.py [edge]   (default BENCH_SCALE=448)
       BENCH_SUITE=llm python bench_scaling.py
           -> scales the two iterative LLM stages (minhash LSH over the
              full sf0.1 documents table + connected components) instead
              of the geometry stages, and merges an "llm" section into
              BENCH_SCALING.json (VERDICT r2 #4)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# north-rule metrics: join rows/sec + tiles merged/sec. tile_select and
# knn are reported but not in the headline efficiency (fixed driver/job
# overheads dominate them at sandbox scale).
HEADLINE = ("cell_join", "mosaic_stitch")
SCALABLE = ("tile_select", "cell_join", "mosaic_stitch", "knn_cell_ring")


def run_bench(cpus: int, edge: int, suite: str = "headline") -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["BENCH_SCALE"] = str(edge)
    # 16 image revisions per cell: the join stage gets 8x the scan/probe
    # work of the 2-src default, so its timing is dominated by scalable
    # work rather than the fixed broadcast-build + planning cost (the
    # realistic shape — at 10^12 rows the fixed second is nothing)
    env.setdefault("BENCH_SRCS", "16")
    env["BENCH_STAGES"] = suite
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"bench failed at cpus={cpus}")
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    d["wall_total"] = round(time.time() - t0, 1)
    return d


def _merge_section(key: str, section: dict) -> None:
    """Read-merge-write one section of BENCH_SCALING.json (shared by
    every suite)."""
    path = os.path.join(os.path.dirname(__file__), "BENCH_SCALING.json")
    report = {}
    if os.path.exists(path):
        with open(path) as f:
            report = json.load(f)
    report[key] = section
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(section))


def _cal_work(n: int) -> int:
    from tilegrab_spark.kernels import png

    data = png.encode_png(png.synth_tile_pixels(23000, 15000, 15, 0), filter_type=2)
    for _ in range(n):
        png.decode_png(data)
    return n


def kernel_calibration() -> dict:
    """Pure-kernel (no Spark) multiprocess decode throughput at each core
    count — the box's own scaling ceiling."""
    from multiprocessing import Pool

    work = _cal_work
    out = {}
    N = 16000
    for procs in (2, 8, 32):
        t0 = time.time()
        with Pool(procs) as p:
            p.map(work, [N // procs] * procs)
        out[procs] = round(N / (time.time() - t0), 0)
    return out


def main():
    suite = os.environ.get("BENCH_SUITE", "headline")
    if suite == "llm":
        return main_llm()
    edge = int(sys.argv[1]) if len(sys.argv) > 1 else 448
    levels = [32, 8, 2]  # largest first: generates the cached image table
    results = {}
    for cpus in levels:
        print(f"=== bench at local[{cpus}] ===", file=sys.stderr, flush=True)
        results[cpus] = run_bench(cpus, edge)

    def scalable_secs(d):
        return sum(d["queries"][k] for k in HEADLINE)

    def stage_eff(lo, hi, stage=None):
        tlo = results[lo]["queries"][stage] if stage else scalable_secs(results[lo])
        thi = results[hi]["queries"][stage] if stage else scalable_secs(results[hi])
        speedup = tlo / thi
        return round(speedup / (hi / lo), 3)

    report = {
        "edge": edge,
        "image_rows": results[32]["rows"]["cell_join"],
        "levels": {
            str(c): {
                "scalable_secs": round(scalable_secs(d), 2),
                "queries": {k: d["queries"][k] for k in SCALABLE},
                "throughput": d["throughput"],
            }
            for c, d in results.items()
        },
        "efficiency": {
            "2_to_8": {
                "combined": stage_eff(2, 8),
                **{s: stage_eff(2, 8, s) for s in SCALABLE},
            },
            "8_to_32": {
                "combined": stage_eff(8, 32),
                **{s: stage_eff(8, 32, s) for s in SCALABLE},
            },
        },
        "hardware_calibration_decodes_per_sec": kernel_calibration(),
    }
    cal = report["hardware_calibration_decodes_per_sec"]
    report["hardware_ceiling_efficiency"] = {
        "2_to_8": round(cal[8] / cal[2] / 4, 3),
        "8_to_32": round(cal[32] / cal[8] / 4, 3),
    }
    # MERGE into the existing file — the llm / cc_scale suites keep
    # their own sections (this used to overwrite and drop them)
    path = os.path.join(os.path.dirname(__file__), "BENCH_SCALING.json")
    full = {}
    if os.path.exists(path):
        with open(path) as f:
            full = json.load(f)
    full.update(report)
    with open(path, "w") as f:
        json.dump(full, f, indent=2)
    print(json.dumps(report))


def main_llm():
    """Scaling efficiency of the two ITERATIVE LLM stages. Each runs
    best-of-2 per level (same steady-state policy as bench.py) over the
    unchanged sf0.1 documents table; no image-table generation."""
    stages = ("minhash_lsh_full", "connected_components")
    os.environ.setdefault("BENCH_DOCS_MULT", "16")
    results = {}
    for cpus in (32, 8, 2):
        print(f"=== llm bench at local[{cpus}] ===", file=sys.stderr, flush=True)
        a = run_bench(cpus, 0, suite="llm")
        b = run_bench(cpus, 0, suite="llm")
        best = {s: min(a["queries"][s], b["queries"][s]) for s in stages}
        results[cpus] = {"queries": best, "throughput": a["throughput"],
                         "rows": a["rows"]}

    def eff(lo, hi, s=None):
        tlo = (sum(results[lo]["queries"].values()) if s is None
               else results[lo]["queries"][s])
        thi = (sum(results[hi]["queries"].values()) if s is None
               else results[hi]["queries"][s])
        return round((tlo / thi) / (hi / lo), 3)

    section = {
        "levels": {str(c): d for c, d in results.items()},
        "efficiency": {
            "2_to_8": {"combined": eff(2, 8),
                       **{s: eff(2, 8, s) for s in stages}},
            "8_to_32": {"combined": eff(8, 32),
                        **{s: eff(8, 32, s) for s in stages}},
        },
    }
    _merge_section("llm", section)


def main_cc():
    """Connected components at W-DOMINATED scale (VERDICT r3 #6):
    BENCH_DOCS_MULT=64 x BENCH_CC_DEGREE=4 k-neighbor edges over the
    sf0.1 documents table -> ~1.27M edges, so the scalable per-round
    work W/c dominates the per-round fixed task-launch cost f that made
    the sandbox-scale CC profile flat (t@8 < t@2 < t@32). Shows t
    scaling with W and the 2->8 efficiency recovering."""
    os.environ.setdefault("BENCH_DOCS_MULT", "64")
    os.environ.setdefault("BENCH_CC_DEGREE", "4")
    stage = "connected_components_scale"
    results = {}
    for cpus in (32, 8, 2):
        print(f"=== cc-scale bench at local[{cpus}] ===", file=sys.stderr, flush=True)
        a = run_bench(cpus, 0, suite="cc")
        b = run_bench(cpus, 0, suite="cc")
        results[cpus] = {
            "secs": min(a["queries"][stage], b["queries"][stage]),
            "components": a["rows"][stage],
        }

    def eff(lo, hi):
        return round((results[lo]["secs"] / results[hi]["secs"]) / (hi / lo), 3)

    section = {
        "docs_mult": int(os.environ["BENCH_DOCS_MULT"]),
        "cc_degree": int(os.environ["BENCH_CC_DEGREE"]),
        "levels": {str(c): d for c, d in results.items()},
        "efficiency": {"2_to_8": eff(2, 8), "8_to_32": eff(8, 32)},
    }
    _merge_section("cc_scale", section)


def main_r4geo():
    """Round-4 geospatial stages (snap / overlay / DSIR) at W-dominated
    scale: BENCH_R4GEO_MULT multiplies the synthetic lakes (points x
    mult, polygon grid x sqrt(mult) with the blocking zoom tracking
    density, documents x mult) so the N-vs-4N comparison measures
    scalable work, not task-launch fixed cost."""
    os.environ.setdefault("BENCH_R4GEO_MULT", "8")
    stages = ("snap_points", "overlay_join", "dsir_weights")
    results = {}
    for cpus in (32, 8, 2):
        print(f"=== r4geo bench at local[{cpus}] ===", file=sys.stderr, flush=True)
        a = run_bench(cpus, 0, suite="r4geo")
        b = run_bench(cpus, 0, suite="r4geo")
        results[cpus] = {
            s: min(a["queries"][s], b["queries"][s]) for s in stages
        }
        results[cpus]["total"] = round(sum(results[cpus].values()), 3)
        results[cpus]["rows"] = a["rows"]

    def eff(lo, hi, key):
        return round(
            (results[lo][key] / results[hi][key]) / (hi / lo), 3
        )

    section = {
        "r4geo_mult": int(os.environ["BENCH_R4GEO_MULT"]),
        "levels": {str(c): d for c, d in results.items()},
        "efficiency": {
            "2_to_8": {s: eff(2, 8, s) for s in stages + ("total",)},
            "8_to_32": {s: eff(8, 32, s) for s in stages + ("total",)},
        },
    }
    _merge_section("r4geo_scale", section)


def main_s2():
    """Spherical-addressing encode throughput at three parallelism
    levels (north-rule proxy): s2_encode = the full trig + cube-face +
    quadratic-ST + 18-level Hilbert-fold pipeline, hilbert_encode = the
    bare fold — both pure whole-stage-codegen Catalyst, W linear in
    BENCH_S2_N, no input files and no Python workers anywhere."""
    os.environ.setdefault("BENCH_S2_N", "8000000")
    n = int(os.environ["BENCH_S2_N"])
    stages = ("s2_encode", "hilbert_encode")
    results = {}
    for cpus in (32, 8, 2):
        print(f"=== s2 bench at local[{cpus}] ===", file=sys.stderr, flush=True)
        a = run_bench(cpus, 0, suite="s2")
        b = run_bench(cpus, 0, suite="s2")
        results[cpus] = {
            st: min(a["queries"][st], b["queries"][st]) for st in stages
        }
        for st in stages:
            results[cpus][f"{st}_rows_per_sec"] = round(n / results[cpus][st], 0)

    def eff(lo, hi, key):
        return round((results[lo][key] / results[hi][key]) / (hi / lo), 3)

    section = {
        "protocol": (
            "BENCH_STAGES=s2: pure-Catalyst S2 / Hilbert key encode over "
            f"{n} hash-spread global points; modular-sum aggregate "
            "consumes the key (no projection pruning); best-of-2 per "
            "level, fresh JVM per run"
        ),
        "n_points": n,
        "levels": {str(c): d for c, d in results.items()},
        "efficiency": {
            "2_to_8": {st: eff(2, 8, st) for st in stages},
            "8_to_32": {st: eff(8, 32, st) for st in stages},
        },
    }
    _merge_section("s2_scale", section)


def main_graphsim():
    """Graph/trajectory additions at three parallelism levels:
    track_hausdorff = candidate blocking + the default Arrow
    (numpy pairwise-matrix) Hausdorff refine (W ∝ BENCH_SIM_GROUPS
    convoys × 28 pairs × 64² great-circle evals), pagerank_5 = five power-iteration rounds over
    BENCH_PR_EDGES hash edges (per-round W ∝ edges). Both synthesize
    their tables in-session — no input files."""
    os.environ.setdefault("BENCH_SIM_GROUPS", "600")
    os.environ.setdefault("BENCH_PR_EDGES", "2000000")
    stages = ("track_hausdorff", "pagerank_5")
    work = {
        "track_hausdorff": int(os.environ["BENCH_SIM_GROUPS"]) * 28 * 64 * 64,
        "pagerank_5": int(os.environ["BENCH_PR_EDGES"]) * 5,
    }
    results = {}
    for cpus in (32, 8, 2):
        print(f"=== graphsim bench at local[{cpus}] ===", file=sys.stderr, flush=True)
        a = run_bench(cpus, 0, suite="graphsim")
        b = run_bench(cpus, 0, suite="graphsim")
        results[cpus] = {
            st: min(a["queries"][st], b["queries"][st]) for st in stages
        }
        for st in stages:
            results[cpus][f"{st}_work_per_sec"] = round(
                work[st] / results[cpus][st], 0
            )

    def eff(lo, hi, key):
        return round((results[lo][key] / results[hi][key]) / (hi / lo), 3)

    section = {
        "protocol": (
            "BENCH_STAGES=graphsim: track_similarity_join (hausdorff) over "
            f"{os.environ['BENCH_SIM_GROUPS']} 8-track convoys (64 fixes each, "
            "within-convoy pair distances < 120 m, convoy centers hash-spread "
            "globally) + 5-round pagerank over "
            f"{os.environ['BENCH_PR_EDGES']} hash edges on "
            f"{os.environ.get('BENCH_PR_NODES', '200000')} nodes; best-of-2 "
            "per level, fresh JVM per run; work units = pair-haversines and "
            "edge-relaxations respectively"
        ),
        "levels": {str(c): d for c, d in results.items()},
        "efficiency": {
            "2_to_8": {st: eff(2, 8, st) for st in stages},
            "8_to_32": {st: eff(8, 32, st) for st in stages},
        },
    }
    _merge_section("graphsim_scale", section)


def main_mediasim():
    """Media fingerprint pipelines at three parallelism levels:
    audio_fp_match (WAV decode + Hann-rFFT landmarks + hash join +
    offset vote) and video_fp_match (AVI parse + JPEG decode + phash +
    band join + vote) over BENCH_MEDIA_N embedded-clip items per
    modality — decode/FFT-bound mapInPandas work, the embarrassingly
    parallel regime."""
    os.environ.setdefault("BENCH_MEDIA_N", "96")
    n = int(os.environ["BENCH_MEDIA_N"])
    stages = ("audio_fp_match", "video_fp_match")
    results = {}
    for cpus in (32, 8, 2):
        print(f"=== mediasim bench at local[{cpus}] ===", file=sys.stderr, flush=True)
        a = run_bench(cpus, 0, suite="mediasim")
        b = run_bench(cpus, 0, suite="mediasim")
        results[cpus] = {st: min(a["queries"][st], b["queries"][st]) for st in stages}
        for st in stages:
            results[cpus][f"{st}_items_per_sec"] = round(
                2 * n / results[cpus][st], 1
            )

    def eff(lo, hi, key):
        return round((results[lo][key] / results[hi][key]) / (hi / lo), 3)

    section = {
        "protocol": (
            f"BENCH_STAGES=mediasim: {n} embedded-clip items per modality "
            "(each = one clip + one longer recording containing it; audio "
            "WAV 8 kHz, video 16-frame MJPEG-AVI re-encoded at q60); full "
            "fingerprint+match pipeline timed; best-of-2 per level, fresh "
            "JVM per run; items = 2N payloads per modality"
        ),
        "levels": {str(c): d for c, d in results.items()},
        "efficiency": {
            "2_to_8": {st: eff(2, 8, st) for st in stages},
            "8_to_32": {st: eff(8, 32, st) for st in stages},
        },
    }
    _merge_section("mediasim_scale", section)


if __name__ == "__main__":
    if os.environ.get("BENCH_SUITE") == "cc":
        main_cc()
    elif os.environ.get("BENCH_SUITE") == "r4geo":
        main_r4geo()
    elif os.environ.get("BENCH_SUITE") == "s2":
        main_s2()
    elif os.environ.get("BENCH_SUITE") == "graphsim":
        main_graphsim()
    elif os.environ.get("BENCH_SUITE") == "mediasim":
        main_mediasim()
    else:
        main()
