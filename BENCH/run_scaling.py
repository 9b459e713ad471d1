"""Scaling-efficiency evidence for the north rule (N → 4N parallelism).

No real cluster exists in this sandbox, so per the driver instruction the
same job runs at two parallelism levels on the same input and we report
throughput at both plus strong-scaling efficiency
    eff = (T_N / T_4N) / 4          (1.0 = perfect linear scaling)

Methodology (round 2 — each point hard-won against this VM's noise):

* **Per-query scales.** Fixed driver overhead (~2-6 s of job barriers,
  broadcast builds, AQE stage scheduling) does not shrink with more cores;
  a query must run long enough that compute dominates. Each query runs at
  the QUERY_SCALES default below — chosen so its 2-core wall is ≥ 30 s
  (pip_zonal at BENCH_SCALE=400 = 48 M interleaved units, knn at 400,
  zonal_stats at 80, raster_stats at 40, dedup_text at 120 = 600 k synthetic
  text docs; dedup moved 60 -> 120 in round 4 after the corpus re-layout
  dropped its 2-core wall to ~38 s with ~3 s of fixed overhead left;
  text_profile_scaled at 120 = 600 k docs, 2-core wall ~128 s). A measurement whose 2-core wall
  is under ~30 s is floor-dominated and is NOT valid efficiency evidence.
  pip_zonal moved 200 → 400 in round 3: at 200 its measured ~8.6 s of
  serial driver time (Amdahl fit of the 91.6 s / 29.4 s pair) still costs
  ~0.08 efficiency; doubling the corpus halves the serial share.
* **Fresh JVM per measurement, warm + one timed rep inside.** Local-mode
  JVMs DEGRADE on repeated heavy queries when the heap is large: with
  SPARK_DRIVER_MEM=48g the *second* execution of the pip_zonal plan at
  local[8] reliably collapses 16 s → 160-180 s (event-log: the parquet
  scan stage's task CPU inflates 36×, zero GC time — pathological page/THP
  behavior of a huge mostly-empty heap, reproduced 5×; never at local[2],
  never with 12g). All measurements therefore use 12g heaps and fresh JVMs.
  Round 1's 0.35-0.57 efficiencies were partly THIS artifact poisoning the
  4N level.
* **Interleaved levels, min over reps.** The host is multi-tenant: a
  single-threaded CPU canary swings 3.6-5.3 s and Spark walls 3× between
  noise windows minutes apart. Levels alternate (2,8,2,8,...) so both sample
  the same windows; min-of-REPS per level estimates the uncontended wall.
  The canary is recorded before every run so the windows are auditable.
* **Hardware ceiling.** A pure-CPU multiprocessing microbenchmark bounds
  what any job could scale on this VM (2→8 procs ≈ 1.0; 8→32 ≈ 0.66 due to
  SMT siblings — which is why the N→4N evidence uses local[2] → local[8]).

Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LO = int(os.environ.get("SCALING_LO", "2"))
HI = int(os.environ.get("SCALING_HI", "8"))
REPS = int(os.environ.get("SCALING_REPS", "3"))
# query -> corpus scale where compute dominates the driver floor
QUERY_SCALES = json.loads(
    os.environ.get(
        "SCALING_QUERY_SCALES",
        '{"pip_zonal": 400, "knn": 800, "raster_stats": 40, "zonal_stats": 240, '
        '"dedup_text": 240, "text_profile_scaled": 360}',
    )
)
DRIVER_MEM = os.environ.get("SPARK_DRIVER_MEM", "12g")  # see module docstring

# Per-query JVM tuning for the sweep's fresh 12 GB JVMs. triangles: the
# wedge stage's allocation rate makes ParallelGC's young-gen collections a
# core-count-dependent tax (scale 2000 local[8]: 14.8 task-core-s of GC vs
# ZERO at local[2] — the 2-core run stays under the collection threshold
# for the stage's lifetime; scale 6000: 54.9 core-s even with -Xmn8g).
# G1 on the sweep's PINNED 12 GB heap absorbs it entirely (GC 0.0 at both
# levels and both scales, stage CPU flat 224.6 vs 234.8 core-s at scale
# 6000) — the session default stays ParallelGC because the measured G1
# pathology (region commit churn) only applies to large GROWING heaps,
# which the sweep's Xms=Xmx pin rules out (session.py).
QUERY_EXTRA_ENV = {
    "triangles": {"SPARK_GC": "G1GC"},
}


def _pywork(_):
    s = 0
    for i in range(12_000_000):
        s += i * i
    return s


def canary() -> float:
    """Single-threaded CPU canary — logs the host-noise window."""
    t0 = time.perf_counter()
    _pywork(0)
    return round(time.perf_counter() - t0, 2)


def hardware_ceiling() -> dict:
    """Per-process throughput at each level (weak scaling of pure CPU work).

    Best-of-3 per level: the ceiling is a CAPABILITY bound, so each level
    takes its fastest window — one slow 1-proc draw otherwise inverts the
    whole table (observed: a noisy single run printed 2-proc throughput
    1.36× the 1-proc baseline, an impossibility)."""
    times = {}
    for n in (1, LO, HI, 32):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            with mp.Pool(n) as p:
                p.map(_pywork, range(n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    thr = {n: times[1] / times[n] for n in times}
    return {
        "per_proc_throughput": {str(n): round(v, 3) for n, v in thr.items()},
        "strong_scaling_ceiling_lo_hi": round(thr[HI] / thr[LO], 3),
    }


def _bwork(_):
    import numpy as np

    a = np.empty(200_000_000, dtype=np.uint8)
    b = np.empty_like(a)
    a[:] = 1
    b[:] = 2  # pre-fault both buffers — page-fault cost otherwise
    # dominates the first pass and inverts the per-proc comparison
    np.copyto(b, a)  # warm
    t0 = time.perf_counter()
    for _ in range(10):
        np.copyto(b, a)
    return time.perf_counter() - t0


def bandwidth_ceiling() -> dict:
    """Strong-scaling ceiling for MEMORY-BANDWIDTH-bound work (the CPU
    canary above measures compute-bound scaling; a stage that streams
    hundreds of millions of short-lived rows — e.g. the triangle wedge
    stream — is bound by DRAM bandwidth instead, which is SHARED across
    the socket's cores; on a real N→4N cluster it scales with nodes).
    Best-of-3 per level of a 2 GB/iteration memcpy loop; the ceiling is
    the ratio of per-process throughput at HI vs LO procs."""
    thr = {}
    for n in (1, LO, HI, 32):
        best = float("inf")
        for _ in range(3):
            with mp.Pool(n) as p:
                r = p.map(_bwork, range(n))
            best = min(best, max(r))
        thr[n] = 4.0 / best  # GB/s per process
    return {
        "per_proc_copy_gbps": {str(n): round(v, 2) for n, v in thr.items()},
        "bandwidth_scaling_ceiling_lo_hi": round(thr[HI] / thr[LO], 3),
    }


def _lwork(_):
    import numpy as np

    rng = np.random.default_rng(7)
    table = np.arange(45_000_000, dtype=np.int64)  # 360 MB working set
    idx = rng.integers(0, table.size, 20_000_000)
    table[idx[:1000]] += 0  # pre-fault (same lesson as _bwork)
    t0 = time.perf_counter()
    s = 0
    for _ in range(4):
        s += int(table[idx].sum())  # random gather — latency/MLP bound
    return time.perf_counter() - t0


def latency_ceiling() -> dict:
    """Strong-scaling ceiling for RANDOM-ACCESS-bound work: per-process
    throughput of 20 M random int64 gathers into a 360 MB table (the size
    class of a corpus-scale broadcast hash relation). Distinct from the
    streaming probe: pointer-chasing is limited by memory-level
    parallelism and shared LLC/DRAM queue depth, which CAN degrade with
    active cores while streaming bandwidth holds (measured on this VM:
    triangles close-probe CPU inflated 2.7× from 2→8 cores while the
    memcpy probe scaled cleanly — BENCH/BASELINE.md round-4 notes). On a
    real N→4N cluster the executor's cores-per-node is CONSTANT across
    levels, so this term is level-invariant there; on the cores-on-one-box
    proxy it shows up as anti-scaling. Best-of-3 per level."""
    thr = {}
    for n in (1, LO, HI):
        best = float("inf")
        for _ in range(3):
            with mp.Pool(n) as p:
                r = p.map(_lwork, range(n))
            best = min(best, max(r))
        thr[n] = 80_000_000 / best / 1e6  # M gathers/s per process
    return {
        "per_proc_gathers_mps": {str(n): round(v, 1) for n, v in thr.items()},
        "latency_scaling_ceiling_lo_hi": round(thr[HI] / thr[LO], 3),
    }


def run_one(query: str, cpus: int, scale: int) -> dict:
    """One fresh-JVM bench.py run: warm + one timed rep of a single query."""
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_ONLY=query,
        BENCH_SCALE=str(scale),
        BENCH_REPS="1",
        BENCH_STEADY="1",
        SPARK_DRIVER_MEM=DRIVER_MEM,
        SPARK_XMS=DRIVER_MEM,  # full heap pin — methodology opt-in (session.py)
        **QUERY_EXTRA_ENV.get(query, {}),
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    if out.returncode != 0:
        print(out.stderr[-4000:], file=sys.stderr)
        raise SystemExit(f"bench {query} at local[{cpus}] failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    cal = hardware_ceiling()
    ceiling = cal["strong_scaling_ceiling_lo_hi"]
    bw = bandwidth_ceiling()
    bw_ceiling = bw["bandwidth_scaling_ceiling_lo_hi"]
    lat = latency_ceiling()
    lat_ceiling = lat["latency_scaling_ceiling_lo_hi"]
    ratio = HI / LO

    # Pairing: measured sweeps showed the host's noise windows shift on a
    # ~10 min timescale — a full LO sweep followed by a full HI sweep can
    # put the two levels of the SAME query in different windows (observed:
    # raster_stats LO 78→108 s across reps while HI sat at 25-30 s). Each
    # rep therefore runs a query's LO and HI back-to-back (minutes apart),
    # and the headline efficiency is the MEDIAN over per-rep pairs; the
    # min-wall efficiency is reported alongside.
    pairs: dict[str, list] = {q: [] for q in QUERY_SCALES}  # (lo, hi, canary)
    meta: dict[str, dict] = {}
    # SCALING_MERGE_LOGS: comma-separated stderr logs of PRIOR sweeps run with
    # the same code/corpus/method; their per-rep pair lines are merged in so a
    # follow-up sweep adds reps instead of discarding the earlier sample. Only
    # lines whose query and scale match the current QUERY_SCALES are taken.
    n_merged = 0
    for path in filter(None, os.environ.get("SCALING_MERGE_LOGS", "").split(",")):
        import re as _re

        pat = _re.compile(
            rf"# rep\d+ (\w+)@(\d+): local\[{LO}\]=([\d.]+)s "
            rf"local\[{HI}\]=([\d.]+)s pair_eff=[\d.]+ \(canary ([\d.]+)s\)"
        )
        for line in Path(path).read_text().splitlines():
            m = pat.match(line.strip())
            if not m:
                continue
            q, scale, lo, hi, c = m.groups()
            if q in QUERY_SCALES and int(scale) == QUERY_SCALES[q]:
                pairs[q].append((float(lo), float(hi), float(c)))
                n_merged += 1
    merged_reps = min(len(v) for v in pairs.values()) if n_merged else 0
    for rep in range(merged_reps, merged_reps + REPS):
        for q, scale in QUERY_SCALES.items():
            c = canary()
            r_lo = run_one(q, LO, scale)
            r_hi = run_one(q, HI, scale)
            lo, hi = r_lo["queries"][q], r_hi["queries"][q]
            pairs[q].append((lo, hi, c))
            meta[q] = r_hi
            print(
                f"# rep{rep} {q}@{scale}: local[{LO}]={lo}s local[{HI}]={hi}s "
                f"pair_eff={round(lo / hi / ratio, 3)} (canary {c}s)",
                file=sys.stderr,
                flush=True,
            )

    empty = [q for q in QUERY_SCALES if not pairs[q]]
    if empty:
        raise SystemExit(
            f"no pairs for {empty}: merged logs carry no lines at these "
            f"queries' scales and SCALING_REPS={REPS} ran no fresh reps — "
            "fix SCALING_QUERY_SCALES/SCALING_MERGE_LOGS or raise SCALING_REPS"
        )

    def median(xs):
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    per_q = {}
    for q in QUERY_SCALES:
        lo_runs = [p[0] for p in pairs[q]]
        hi_runs = [p[1] for p in pairs[q]]
        t_lo, t_hi = min(lo_runs), min(hi_runs)
        pair_effs = [round(lo / hi / ratio, 3) for lo, hi, _ in pairs[q]]
        per_q[q] = {
            "scale": QUERY_SCALES[q],
            "t_lo": t_lo,
            "t_hi": t_hi,
            "eff": median(pair_effs),
            "eff_min_walls": round(t_lo / t_hi / ratio, 3),
            "pair_effs": pair_effs,
            "runs_lo": lo_runs,
            "runs_hi": hi_runs,
            "canaries": [c for _, _, c in pairs[q]],
        }
    n_full_reps = min(len(v) for v in pairs.values())
    suite_eff = round(
        median(
            [
                sum(pairs[q][rep][0] for q in QUERY_SCALES)
                / sum(pairs[q][rep][1] for q in QUERY_SCALES)
                / ratio
                for rep in range(n_full_reps)
            ]
        ),
        3,
    )
    pz = per_q.get("pip_zonal")
    # A merge-only aggregation run (SCALING_REPS=0 over prior logs) spawns no
    # fresh benches, so meta is empty; the unit count for the headline query is
    # deterministic per scale and may be supplied via SCALING_HEADLINE_UNITS.
    headline_units = meta.get("pip_zonal", {}).get("tiles_plus_docs") or (
        int(os.environ["SCALING_HEADLINE_UNITS"])
        if "SCALING_HEADLINE_UNITS" in os.environ
        else None
    )
    headline_thr = round(headline_units / pz["t_hi"], 1) if pz and headline_units else None

    md = [
        "# BENCH/BASELINE.md — measured throughput + scaling efficiency",
        "",
        "## North-rule evidence: same job, two parallelism levels "
        f"(local[{LO}] → local[{HI}] = N → 4N)",
        "",
        "Method (full rationale in BENCH/run_scaling.py): per-query corpus "
        "scales sized so compute dominates the fixed driver floor; fresh "
        "12 GB-heap JVM per measurement (48 GB heaps reproducibly poison "
        "repeat executions at the 4N level — a local-mode artifact "
        "documented in the script); each rep runs a query's two levels "
        "back-to-back so both land in the same host-noise window, across "
        f"{n_full_reps} reps; headline efficiency = median of per-rep pair "
        "efficiencies (min-wall efficiency shown alongside); single-thread "
        "CPU canary logged before every pair."
        + (
            " Pairs were merged from prior same-method sweep logs "
            "(`SCALING_MERGE_LOGS`; see the provenance section): a PAIR's "
            "two levels always share one noise window, but the suite "
            "efficiency pairs rep INDICES, which may span sweeps."
            if n_merged
            else ""
        ),
        "",
        f"| query | scale | local[{LO}] s (runs) | local[{HI}] s (runs) | "
        "pair efficiencies | median eff | min-walls eff |",
        "|---|---|---|---|---|---|---|",
        *(
            f"| {q} | {v['scale']} | **{v['t_lo']}** {v['runs_lo']} | "
            f"**{v['t_hi']}** {v['runs_hi']} | {v['pair_effs']} | "
            f"**{v['eff']}** | {v['eff_min_walls']} |"
            for q, v in per_q.items()
        ),
        "",
        f"**Suite strong-scaling efficiency (median over reps of paired "
        f"Σ walls): {suite_eff}** "
        "(target ≥ 0.8 per BASELINE.json north_rule).",
        "",
        f"Headline throughput (north metric): **{headline_thr} tiles+docs/s** "
        f"at local[{HI}], pip_zonal @ scale {QUERY_SCALES.get('pip_zonal')} "
        f"({headline_units} interleaved units).",
        "",
        "## Hardware calibration (pure-CPU multiprocessing, this VM)",
        "",
        "| procs | relative per-process throughput |",
        "|---|---|",
        *(f"| {n} | {v} |" for n, v in cal["per_proc_throughput"].items()),
        "",
        f"The VM's own strong-scaling ceiling for {LO}→{HI} cores is "
        f"**{ceiling}** (and ~0.66-0.8 for 8→32 — SMT siblings / host "
        f"contention), which is why the N→4N evidence uses local[{LO}] → "
        f"local[{HI}].",
        "",
        "Canary walls during the sweep (host-noise audit): "
        + ", ".join(
            f"{q}: {v['canaries']}" for q, v in per_q.items()
        ),
        "",
        "Efficiency = (T_N / T_4N) / 4 on identical deterministic input — "
        "the sandbox proxy for N vs 4N executors required by the driver "
        "instruction. bench.py warms each JVM before timing; value excludes "
        "session startup.",
        "",
        "## Interpretation vs the hardware ceiling",
        "",
        f"| query | median eff | eff / ceiling ({ceiling}) |",
        "|---|---|---|",
        *(
            f"| {q} | {v['eff']} | {round(min(v['eff'] / ceiling, 1.5), 2)} |"
            for q, v in per_q.items()
        ),
        "",
        "A query at the ceiling is scaling as well as ANY computation can on "
        "this VM's 2→8 cores (SMT siblings + multi-tenant contention). "
        "Pair efficiencies above 1.0 are host-noise draws (the canary logs "
        "the windows); the median over paired reps is the reported figure.",
        "",
        "## Memory-subsystem ceilings (streaming vs random-access, this VM)",
        "",
        "| procs | per-proc memcpy GB/s | per-proc random gathers M/s |",
        "|---|---|---|",
        *(
            f"| {n} | {v} | {lat['per_proc_gathers_mps'].get(n, '—')} |"
            for n, v in bw["per_proc_copy_gbps"].items()
        ),
        "",
        f"Two distinct memory regimes, probed separately (pre-faulted "
        f"buffers — page faults otherwise dominate the first pass): "
        f"STREAMING (memcpy) scales {LO}→{HI} at **{bw_ceiling}** on this "
        f"VM — not a limiter. RANDOM ACCESS (20 M int64 gathers into a "
        f"360 MB table, the size class of a corpus-scale broadcast hash "
        f"relation) scales at **{lat_ceiling}** — pointer-chasing is bound "
        f"by memory-level parallelism and shared LLC/DRAM queue depth, "
        f"which degrade with active cores. A stage probing a large "
        f"broadcast relation inherits this term (measured directly on the "
        f"triangles close: stage CPU inflated 62.7→166.7 core-s from "
        f"local[{LO}] to local[{HI}] with the 2-column key — see PERF.md; "
        f"packing the key to one int64 shrank the relation and flattened "
        f"the CPU at moderate sizes). On a real N→4N cluster the executor's "
        f"CORES-PER-NODE is constant across levels, so this per-box term is "
        f"level-invariant there; on the cores-on-one-box proxy it appears "
        f"as anti-scaling. Rows whose dominant stage probes a broadcast of "
        f"this size class are therefore read against the random-access "
        f"ceiling, not the compute ceiling.",
    ]
    (REPO / "BENCH" / "BASELINE.md").write_text("\n".join(md) + "\n")
    print(
        json.dumps(
            {
                "efficiency_suite": suite_eff,
                "per_query": {q: {k: v[k] for k in ("scale", "t_lo", "t_hi", "eff")} for q, v in per_q.items()},
                "headline_throughput_tiles_docs_per_sec": headline_thr,
                "hw_ceiling": ceiling,
                "bw_ceiling": bw_ceiling,
                "latency_ceiling": lat_ceiling,
            }
        )
    )


if __name__ == "__main__":
    main()
