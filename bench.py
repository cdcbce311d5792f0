"""Benchmark harness (driver contract).

Plain run: ``python bench.py`` — owns one Ray session sized by
``$RAY_GRAFT_CPUS`` (default 32), runs the headline pipelines, prints
ONE JSON line:

    {"metric": "index_build_query_total_sec", "value": <sec>, "unit": "sec",
     "queries": {...per-stage sec...}, "sf": <sf>, "num_cpus": N,
     "turns": N, "turns_per_sec": N}

Headline = inverted-index build over a deterministic synthetic
transcript corpus (~600k turns at sf0.1, scaled by sf) + a 200-query
BM25 top-k batch, plus the training-data ops (dedup, similarity,
text analysis) over $GRAFT_SF_DIR tables.

``--scaling``: the same job at two taskset-enforced CPU levels (default
4 and 16 — N and 4N) in fresh interleaved subprocesses on the same
pre-generated input (page cache warmed), reporting both throughputs
and scaling efficiency (the sandbox evidence for the north rule's
N-vs-4N-node criterion; levels via GRAFT_SCALE_LO/HI).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SEED = 42

# corpus sizing: ~600k turns at sf0.1 (FIXTURES.md §1 sf-bench), ~13 turns/conv
_SF_N_CONVS = {"sf0.001": 500, "sf0.01": 4600, "sf0.1": 46000}


def _sf_tag() -> str:
    return os.path.basename(os.path.normpath(SF_DIR))


def _n_convs() -> int:
    # GRAFT_BENCH_CONVS overrides (the scaling run uses a larger corpus so
    # parallel phases dominate fixed per-job overheads)
    override = os.environ.get("GRAFT_BENCH_CONVS")
    if override:
        return int(override)
    return _SF_N_CONVS.get(_sf_tag(), 4600)


def corpus_path() -> str:
    return f"/tmp/graft_bench/transcripts_{_n_convs()}_{SEED}"


def ensure_corpus() -> str:
    from hybrid_sanctions_search_engine_ray.sources.transcripts import generate_transcripts

    n = _n_convs()
    return generate_transcripts(corpus_path(), n_convs=n, seed=SEED, shard_convs=max(512, n // 160))


def bench_queries(n: int = 200) -> list[dict]:
    """Deterministic query mix over the generator vocabulary."""
    import numpy as np

    from hybrid_sanctions_search_engine_ray.sources.transcripts import _vocab

    rng = np.random.default_rng(123)
    vocab = _vocab()
    out = []
    for i in range(n):
        n_terms = int(rng.integers(1, 5))
        # mix: mostly mid-frequency terms, some hot stopwords, some rare
        terms = []
        for _ in range(n_terms):
            r = rng.random()
            if r < 0.2:
                terms.append(vocab[int(rng.integers(0, 40))])           # hot head
            elif r < 0.9:
                terms.append(vocab[int(rng.integers(40, min(600, len(vocab))))])
            else:
                terms.append(vocab[int(rng.integers(0, len(vocab)))])
        out.append({"query_id": f"q-{i:04d}", "query_text": " ".join(terms), "top_k": 50})
    return out


#: quiet-host reference for the calibration probe (median single-core
#: 2000² f64 matmul on an uncontended window of this sandbox, measured
#: repeatedly across rounds) — `queries_calib_normalized` rescales wall
#: times by (this / calib_matmul_sec) so cross-round numbers compare.
CALIB_REF_SEC = 0.30


def _quiet_ray_logs() -> None:
    """Keep the bench JSON line clean: Ray Data emits a cosmetic
    'Failed to hash the schemas (for deduplication): unhashable type'
    warning through its own loggers even at logging_level=ERROR."""
    import logging

    for name in ("ray", "ray.data", "ray.air", "ray._private"):
        logging.getLogger(name).setLevel(logging.ERROR)


def run_bench() -> dict:
    import ray

    _quiet_ray_logs()
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    _quiet_ray_logs()
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from hybrid_sanctions_search_engine_ray.config import AnalyzerConfig, EngineConfig
    from hybrid_sanctions_search_engine_ray.pipelines.index_build import build_index
    from hybrid_sanctions_search_engine_ray.pipelines.query import search

    timings: dict[str, float] = {}

    corpus = ensure_corpus()
    # warm page cache (untimed): one full read pass
    n_turns = rd.read_parquet(corpus).count()

    cfg = EngineConfig(
        num_partitions=64,  # FIXED across CPU levels: same job, same layout
        scorer_concurrency=max(2, NUM_CPUS // 4),
        analyzer=AnalyzerConfig(mode="simple"),
    )
    index_dir = f"/tmp/graft_bench/idx_{_sf_tag()}_{NUM_CPUS}"
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)

    t0 = time.monotonic()
    # generator shards are globally sorted by (conv_id, turn_idx) →
    # doc-id assignment can skip the global sort (equivalence is
    # guarded by tests/test_index_build.py::test_assume_sorted_equivalence)
    build_index(corpus, index_dir, cfg, assume_sorted=True)
    timings["index_build"] = round(time.monotonic() - t0, 3)

    if os.environ.get("GRAFT_BENCH_BUILD_ONLY") == "1":
        result = {
            "metric": "index_build_query_total_sec",
            "value": timings["index_build"],
            "unit": "sec",
            "queries": timings,
            "sf": float(_sf_tag().replace("sf", "")) if _sf_tag().startswith("sf") else _sf_tag(),
            "num_cpus": NUM_CPUS,
            "turns": int(n_turns),
            "turns_per_sec": round(n_turns / timings["index_build"], 1),
        }
        ray.shutdown()
        return result

    qs = bench_queries(200)
    t0 = time.monotonic()
    res = search(rd.from_items(qs), index_dir, cfg)
    n_results = res.count()
    timings["bm25_query_batch"] = round(time.monotonic() - t0, 3)

    # single-query latency distribution on a warm reader (the reference's
    # p50/p95 query-latency metric, BASELINE.md "Query latency")
    from hybrid_sanctions_search_engine_ray.pipelines.query import IndexReader

    reader = IndexReader(index_dir)
    for q in qs[:100]:  # warmup pass (reference parity: deploy warmup queries)
        reader.search_one(q["query_text"], q["top_k"])
    lat = []
    for q in qs[:100]:
        t0 = time.monotonic()
        reader.search_one(q["query_text"], q["top_k"])
        lat.append((time.monotonic() - t0) * 1000)
    lat.sort()
    query_p50_ms = round(lat[len(lat) // 2], 2)
    query_p95_ms = round(lat[int(len(lat) * 0.95)], 2)
    query_p99_ms = round(lat[min(int(len(lat) * 0.99), len(lat) - 1)], 2)

    # training-data ops over the driver tables at $GRAFT_SF_DIR
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    for name in ("exact_dedup", "minhash_pairs", "simhash", "embedding_topk",
                 "text_quality", "dup_spans", "line_dedup", "semdedup",
                 "dsir_select", "sft_examples", "textrank",
                 # round-4 flagship additions
                 "winnow_fp", "kn_bigrams", "interval_join"):
        t0 = time.monotonic()
        out = entrymod.queries()[name](SF_DIR)
        if hasattr(out, "count"):
            out.count()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(timings["index_build"] + timings["bm25_query_batch"], 3)
    result = {
        "metric": "index_build_query_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(_sf_tag().replace("sf", "")) if _sf_tag().startswith("sf") else _sf_tag(),
        "num_cpus": NUM_CPUS,
        "turns": int(n_turns),
        "turns_per_sec": round(n_turns / timings["index_build"], 1),
        "n_results": int(n_results),
        "query_p50_ms": query_p50_ms,
        "query_p95_ms": query_p95_ms,
        "query_p99_ms": query_p99_ms,
        "calib_matmul_sec": _cpu_calibration(),
    }
    # host-speed-normalized per-pipeline figures: sec × (quiet-host probe /
    # this run's probe), so a 3×-slow hypervisor window reads as ~the same
    # normalized number as a quiet one (VERDICT r02 asked for this column)
    scale = CALIB_REF_SEC / max(result["calib_matmul_sec"], 1e-9)
    result["calib_ref_sec"] = CALIB_REF_SEC
    result["queries_calib_normalized"] = {
        k: round(v * scale, 3) for k, v in timings.items()
    }
    result["turns_per_sec_calib_normalized"] = round(
        result["turns_per_sec"] / scale, 1) if scale else None
    ray.shutdown()
    return result


def _cpu_calibration() -> float:
    """Single-core numpy matmul probe (median of 3 × 2000² f64 matmul,
    ~16 GFLOP each). The sandbox host's deliverable CPU varies up to
    ~5-7× between runs with identical code (observed 2026-08-18:
    6.1 s vs 38.5 s index builds, probe 0.3 s vs 1.9 s) — this field
    lets a reader NORMALIZE wall-times across rounds instead of
    mistaking host contention for a code regression."""
    import numpy as _np

    a = _np.random.default_rng(0).random((2000, 2000))
    times = []
    for _ in range(3):
        t0 = time.monotonic()
        a @ a
        times.append(time.monotonic() - t0)
    return round(sorted(times)[1], 3)


def _subprocess_run(ncpu: int, build_only: bool = False) -> dict:
    """Run one bench at ``ncpu`` with HARD cpu affinity (taskset): Ray's
    ``num_cpus`` only limits scheduling slots, while Arrow/numpy kernels
    inside each task would still use every physical core — affinity is
    what actually simulates the smaller cluster."""
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
    if build_only:
        env["GRAFT_BENCH_BUILD_ONLY"] = "1"
    cmd = [sys.executable, os.path.abspath(__file__)]
    if shutil_which("taskset"):
        cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, check=True).stdout
    return json.loads(out.strip().splitlines()[-1])


def shutil_which(name: str):
    import shutil

    return shutil.which(name)


def run_scaling(trials: int | None = None) -> dict:
    trials = trials or int(os.environ.get("GRAFT_SCALE_TRIALS", "4"))
    """Same job at 8 and 32 CPUs, INTERLEAVED fresh-process trials
    (32,8,32,8,…) with per-level medians — interleaving cancels the
    slow drift of a noisy shared hypervisor, medians cut one-off
    spikes. Efficiency = (throughput_hi / throughput_lo) / (hi/lo)."""
    import statistics

    # prepare: generate corpus + warm cache once, untimed, full parallelism
    env = dict(os.environ, RAY_GRAFT_CPUS="32", GRAFT_SF_DIR=SF_DIR)
    subprocess.run([sys.executable, os.path.abspath(__file__), "--prepare"], env=env, check=True,
                   capture_output=True)
    # Default measured pair: 4 → 16 cores (N and 4N). 16- and 32-core
    # walls are EQUAL on this box (the shared-disk + shuffle-barrier
    # floor binds past ~16 cores), so 8→32 measures the single-host
    # floor, not the algorithm — see BASELINE.md "Scaling evidence".
    lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for _ in range(trials):
        runs[hi].append(_subprocess_run(hi, build_only=True))
        runs[lo].append(_subprocess_run(lo, build_only=True))

    def med_build(ncpu: int) -> float:
        return statistics.median(r["queries"]["index_build"] for r in runs[ncpu])

    def med_total(ncpu: int) -> float:
        return statistics.median(r["value"] for r in runs[ncpu])

    turns = runs[hi][0]["turns"]
    tp_lo, tp_hi = turns / med_build(lo), turns / med_build(hi)
    eff_build = (tp_hi / tp_lo) / (hi / lo)
    eff_total = (med_total(lo) / med_total(hi)) / (hi / lo)
    # paired estimator: each round's lo and hi run back-to-back under the
    # same host conditions, so per-round efficiency cancels slow drift of
    # the shared hypervisor; the median of round efficiencies is the most
    # noise-robust statistic this sandbox can produce
    pair_effs = [
        (runs[lo][i]["queries"]["index_build"] / runs[hi][i]["queries"]["index_build"]) / (hi / lo)
        for i in range(trials)
    ]
    eff_paired = statistics.median(pair_effs)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff_build, 3),
        "unit": "ratio",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "trials": trials,
        "turns": turns,
        "build_sec_lo_all": [r["queries"]["index_build"] for r in runs[lo]],
        "build_sec_hi_all": [r["queries"]["index_build"] for r in runs[hi]],
        "build_turns_per_sec_lo": round(tp_lo, 1),
        "build_turns_per_sec_hi": round(tp_hi, 1),
        "total_sec_lo": med_total(lo),
        "total_sec_hi": med_total(hi),
        "scaling_efficiency_build": round(eff_build, 3),
        "scaling_efficiency_total": round(eff_total, 3),
        "per_round_efficiency": [round(e, 3) for e in pair_effs],
        "scaling_efficiency_paired_median": round(eff_paired, 3),
        "calib_matmul_sec": _cpu_calibration(),
    }


def run_prepare() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    corpus = ensure_corpus()
    n = rd.read_parquet(corpus).count()
    ray.shutdown()
    return {"prepared": corpus, "turns": int(n)}


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--prepare" in sys.argv:
        print(json.dumps(run_prepare()))
    else:
        print(json.dumps(run_bench()))
