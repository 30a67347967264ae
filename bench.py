#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and prints ONE JSON line:

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "quads": Q, "quads_per_sec": R}

--scaling: runs the headline KG pipeline in FRESH subprocesses at N=2 and
4N=8 CPUs on identical input and reports both throughputs plus scaling
efficiency (the north_rule's N -> 4N criterion, evidenced in-sandbox per
BASELINE.md). Each child pins its whole process tree to exactly that many
physical cores (sched_setaffinity) so Ray system processes cannot borrow
cores beyond the emulated cluster size, and times a warm run (one prior
pass starts the worker fleet — a real cluster's workers are long-lived).

The headline pipeline is the full KG construction chain on a replicated
pages corpus, END TO END TO STORAGE (read -> synthesize html -> extract
text -> extract+link triples -> bucketed sorted-Parquet materialize), i.e.
every record crosses the whole extraction data plane and is written out.
Replication inflates sf0.1's 5,000 docs deterministically so the
measurement is not overhead-bound.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "50"))
BENCH_REPS = int(os.environ.get("GRAFT_BENCH_REPS", "2"))


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def headline_quads(sf_dir: str, replicate: int, *, write: bool = True) -> int:
    """Full KG chain END-TO-END-TO-STORAGE: read -> synthesize -> extract
    text -> extract+link triples -> bucketed sorted-Parquet materialize
    (write=False stops at count() for micro-comparisons). Returns quad
    count; the write lands in a throwaway /tmp dir per call."""
    from virtuoso_quad_log_ray.sources.pages import read_pages
    from virtuoso_quad_log_ray.stages.extract_text import extract_text
    from virtuoso_quad_log_ray.stages.extract_triples import extract_triples

    pages = read_pages(sf_dir, replicate=replicate)
    quads = extract_triples(extract_text(pages))
    if not write:
        return quads.count()
    import shutil
    import tempfile

    from virtuoso_quad_log_ray.pipelines.materialize import materialize_quads

    # GRAFT_BENCH_OUT_DIR=/dev/shm removes the single-VM disk from scaling
    # runs: this sandbox has ONE ~600 MB/s virtio disk shared by every
    # emulated "node", whereas a real 4N-node cluster brings 4N disks —
    # tmpfs emulates per-node-proportional storage bandwidth.
    out = tempfile.mkdtemp(
        prefix="graft_headline_", dir=os.environ.get("GRAFT_BENCH_OUT_DIR", "/tmp")
    )
    try:
        return materialize_quads(quads, out, epoch="bench").quad_count
    finally:
        shutil.rmtree(out, ignore_errors=True)


def run_suite() -> dict:
    weather_pre = host_health()  # host can change mid-suite: bracket it
    from virtuoso_quad_log_ray.pipelines import changelog as cl
    from virtuoso_quad_log_ray.pipelines import kg
    from virtuoso_quad_log_ray.pipelines import relational as rel
    from virtuoso_quad_log_ray.stages import dedup as dd
    from virtuoso_quad_log_ray.stages import similarity as sim

    timings: dict[str, float] = {}

    def timed(name, fn):
        # Warm best-of-REPS (default 2), like the scaling path: in a
        # long-lived suite session the FIRST dispatch of each query pays
        # ~0.7-1.0 s of worker-side UDF ship/deserialize + scheduler ramp
        # that a steady-state deployment never sees per query (measured:
        # rel_events_hourly 2.01 s first call, 1.26 s the next, same
        # session — the whole r3 "regression"; see BASELINE.md round 4).
        best, n = None, None
        for _ in range(BENCH_REPS):
            t0 = time.perf_counter()
            n = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return n

    # Warm the worker fleet with a real-sized pass: replicate=5 left the
    # 32-CPU fleet half-cold and the first timed headline ~2x slow
    # (measured 9.0 s cold-first vs 4.8-4.9 s warm at replicate 50).
    headline_quads(SF_DIR, min(50, REPLICATE))
    headline_sec, quads = None, 0
    for _ in range(BENCH_REPS):
        t0 = time.perf_counter()
        quads = headline_quads(SF_DIR, REPLICATE)
        dt = round(time.perf_counter() - t0, 3)
        headline_sec = dt if headline_sec is None else min(headline_sec, dt)
    timings["kg_quads_headline"] = headline_sec

    from virtuoso_quad_log_ray.stages import canonicalize as cz
    from virtuoso_quad_log_ray.stages import textstats as tx

    timed("kg_changelog", lambda: cl.changelog(SF_DIR).count())
    timed("kg_dedup_exact", lambda: kg.dedup_quads(kg.build_quads(SF_DIR)).count())
    timed("kg_chunk_plan", lambda: kg.chunk_plan(SF_DIR, max_quads_per_file=50).count())
    timed("dedup_ngram_jaccard", lambda: dd.ngram_jaccard_pairs(SF_DIR).count())
    # production mode: the bench measures the vectorized-hash engine path
    # (the oracle_mode md5 split exists only for SQL re-derivability, and
    # every prior round's minhash numbers are hash128-based)
    from dataclasses import replace as _dc_replace

    from virtuoso_quad_log_ray.config import DEFAULT_CONFIG as _cfg

    _prod = _dc_replace(_cfg, oracle_mode=False)
    timed("dedup_minhash_lsh", lambda: dd.minhash_lsh_pairs(SF_DIR, _prod).count())
    timed("dedup_clusters", lambda: cz.canonicalize_pages(SF_DIR).count())
    timed("text_token_counts", lambda: tx.token_counts(SF_DIR).count())
    timed("ann_topk", lambda: sim.ann_topk(SF_DIR).count())
    timed("ann_topk_ivf", lambda: sim.ann_topk_ivf(SF_DIR).count())
    timed("rel_pricing_summary", lambda: rel.pricing_summary(SF_DIR).count())
    timed("rel_events_hourly", lambda: rel.events_hourly(SF_DIR).count())

    # write path: canonical quads -> sorted Parquet adjacency partitions
    import shutil
    import tempfile

    from virtuoso_quad_log_ray.pipelines.materialize import materialize_quads

    out = tempfile.mkdtemp(prefix="graft_adj_", dir="/tmp")
    try:
        timed(
            "kg_materialize_write",
            lambda: materialize_quads(
                kg.dedup_quads(kg.build_quads(SF_DIR)), out, epoch="bench"
            ).quad_count,
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)

    return {
        "metric": "kg_construction_end_to_end",
        "value": headline_sec,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "quads": quads,
        "quads_per_sec": round(quads / headline_sec, 1),
        "replicate": REPLICATE,
        # host weather bracketing the measurement: suite numbers are
        # comparable across rounds only at similar fault_gbps (host_health)
        "platform": {"pre": weather_pre, "post": host_health()},
    }


SCALING_REPLICATE = int(os.environ.get("GRAFT_SCALING_REPLICATE", "500"))


def _scaling_child(num_cpus: int) -> dict:
    """Run ONLY the headline pipeline in this process; print JSON.

    Pins the process (and every Ray child it spawns) to `num_cpus` physical
    cores so the emulated cluster cannot exceed its size, warms the worker
    fleet with one pass, then times the measured pass.
    """
    os.sched_setaffinity(0, set(range(num_cpus)))
    _init_ray(num_cpus)
    import ray

    # GRAFT_SCALING_WRITE=0 measures the COMPUTE chain only (no sorted-
    # Parquet materialize): during hypervisor memory-reclaim episodes the
    # write path distorts 3-10x while compute stays stable (BASELINE.md
    # round 5), so a count-only rep isolates engine scaling from host
    # weather. The headline criterion stays write-inclusive (default 1).
    write = os.environ.get("GRAFT_SCALING_WRITE", "1") != "0"
    headline_quads(SF_DIR, min(50, SCALING_REPLICATE), write=write)  # warm fleet
    # best of two timed passes: single-run jitter (scheduler placement,
    # allocator state) is ~10% and we are reporting steady-state throughput
    sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        quads = headline_quads(SF_DIR, SCALING_REPLICATE, write=write)
        sec = min(sec, time.perf_counter() - t0)
    ray.shutdown()
    return {"num_cpus": num_cpus, "sec": round(sec, 3), "quads": quads,
            "quads_per_sec": round(quads / sec, 1), "write": write}


SCALING_RUNGS = tuple(
    int(x) for x in os.environ.get("GRAFT_SCALING_RUNGS", "2,8").split(",")
)


def _probe_worker(core: int, kind: str, dur: float, q) -> None:
    os.sched_setaffinity(0, {core})
    import time as _t

    if kind == "cpu":
        import hashlib

        buf = b"x" * 65536
        t0 = _t.perf_counter()
        n = 0
        while _t.perf_counter() - t0 < dur:
            hashlib.sha256(buf).digest()
            n += 1
        q.put(n)
    elif kind == "membw":  # streaming copies of an LLC-busting buffer
        import numpy as np

        a = np.zeros(64 * 1024 * 1024, dtype=np.uint8)
        t0 = _t.perf_counter()
        n = 0
        while _t.perf_counter() - t0 < dur:
            b = a.copy()
            del b
            n += 1
        q.put(n)
    elif kind == "stream":  # prefaulted copies: the BUS, no page faults
        import numpy as np

        a = np.zeros(64 * 1024 * 1024, dtype=np.uint8)
        b = np.empty_like(a)
        np.copyto(b, a)
        t0 = _t.perf_counter()
        n = 0
        while _t.perf_counter() - t0 < dur:
            np.copyto(b, a)
            n += 1
        q.put(n)
    else:  # fault: FRESH 64 MB allocations — page-POPULATION rate.
        # Same work as `membw` (a.copy() allocates anew each pass), kept as
        # a separate absolute single-core reading next to `stream`: on this
        # shared VM the host overcommits memory, and when it is reclaiming
        # (ballooning/KSM) populating a new page costs ~ms — this rate
        # collapses ~100x below `stream` while cpu and stream stay normal
        # (measured 0.1 vs 10.5 GB/s in the same minute). Allocation-heavy
        # Ray stages (every Arrow batch, every plasma buffer) ride this
        # rate, so suite numbers are only comparable at similar fault_gbps.
        import numpy as np

        a = np.zeros(64 * 1024 * 1024, dtype=np.uint8)
        t0 = _t.perf_counter()
        n = 0
        while _t.perf_counter() - t0 < dur:
            b = a.copy()
            del b
            n += 1
        q.put(n)


def _probe_rate(ncores: int, kind: str, dur: float = 5.0) -> float:
    from multiprocessing import Process, Queue

    q: "Queue" = Queue()
    ps = [Process(target=_probe_worker, args=(c, kind, dur, q)) for c in range(ncores)]
    [p.start() for p in ps]
    [p.join() for p in ps]
    return sum(q.get() for _ in ps) / dur


def platform_probe(lo: int, hi: int) -> dict:
    """What fraction of (hi/lo)x the PLATFORM itself delivers between the
    two pinned core sets, measured with no Ray involved — the normalization
    context every raw rung number needs on this shared single-bus VM:

    * ``cpu_eff``   — sha256 over a cache-resident buffer (pure core
      throughput: all-core clocks + hypervisor steal).
    * ``membw_eff`` — 64 MB streaming copies (the single memory bus all
      emulated "nodes" share; string-heavy extraction is bandwidth-bound,
      and a real 4N-node cluster brings 4N buses). Noisy on a shared host
      by nature — report, don't average away.
    """
    ratio = hi / lo
    cpu = _probe_rate(hi, "cpu") / _probe_rate(lo, "cpu") / ratio
    mem = _probe_rate(hi, "membw") / _probe_rate(lo, "membw") / ratio
    return {"cpu_eff": round(cpu, 3), "membw_eff": round(mem, 3), **host_health()}


def host_health(dur: float = 2.0) -> dict:
    """Absolute single-core GB/s for prefaulted copies (`stream_gbps`, the
    bus) vs fresh-allocation copies (`fault_gbps`, page population). On a
    healthy host the two are within ~2x; when the hypervisor is reclaiming
    overcommitted memory, fault_gbps collapses ~100x and every
    allocation-heavy measurement taken in that window is invalid. Emitted
    with every suite/scaling JSON so numbers carry their own weather
    report."""
    stream = _probe_rate(1, "stream", dur) * 64 / 1024
    fault = _probe_rate(1, "fault", dur) * 64 / 1024
    return {"stream_gbps": round(stream, 2), "fault_gbps": round(fault, 2)}


def run_scaling() -> dict:
    results = []
    for n in SCALING_RUNGS:
        out = subprocess.run(
            [sys.executable, __file__, "--scaling-child", str(n)],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        results.append(json.loads(line))
    low, high = results
    speedup = high["quads_per_sec"] / low["quads_per_sec"]
    efficiency = speedup / (high["num_cpus"] / low["num_cpus"])
    plat = platform_probe(SCALING_RUNGS[0], SCALING_RUNGS[1])
    return {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(efficiency, 3),
        "unit": "efficiency",
        "runs": results,
        "speedup": round(speedup, 2),
        "replicate": SCALING_REPLICATE,
        "sf": SF_DIR,
        # raw / cpu_eff: efficiency per unit of compute the box actually
        # delivered (conservative — does NOT correct for the shared memory
        # bus, which membw_eff documents separately)
        "platform": plat,
        "cpu_normalized_efficiency": round(efficiency / plat["cpu_eff"], 3)
        if plat["cpu_eff"]
        else None,
    }


def run_stats(query: str) -> None:
    """Profiling mode: run ONE driver-surface query at suite scale and print
    Ray Data's per-operator stats (`ds.stats()`) — wall time, CPU time, block
    counts, and output sizes per stage. The iterate-on-ds.stats() loop that
    sized every batch/concurrency dial in this repo, exposed as a flag:

        python bench.py --stats dedup_minhash_lsh
    """
    _init_ray(NUM_CPUS)
    import importlib.util

    import ray
    import ray.data

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(os.path.dirname(__file__), "__ray_entry__.py")
    )
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)
    qs = entry_mod.queries()
    if query not in qs:
        print(f"unknown query {query!r}; one of: {', '.join(sorted(qs))}", file=sys.stderr)
        raise SystemExit(2)
    t0 = time.perf_counter()
    res = qs[query](SF_DIR)
    if isinstance(res, ray.data.Dataset):
        m = res.materialize()
        n = m.count()
        print(m.stats())
    else:
        n = len(res)
    print(f"# {query}: {n} rows in {time.perf_counter() - t0:.3f}s at {SF_DIR}")
    ray.shutdown()


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--scaling-child":
        print(json.dumps(_scaling_child(int(sys.argv[2]))))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        print(json.dumps(run_scaling()))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--stats":
        if len(sys.argv) < 3:
            print("usage: bench.py --stats <query_name>", file=sys.stderr)
            raise SystemExit(2)
        run_stats(sys.argv[2])
        return
    _init_ray(NUM_CPUS)
    import ray

    result = run_suite()
    ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
