#!/usr/bin/env bash
# North-rule scaling evidence: the SAME link-and-cluster job, run via the
# graft.Pipeline spark-submit CLI at two parallelism levels (N and 4N cores
# stand in for N and 4N executors — no real cluster in this sandbox), on the
# SAME materialized input. Levels are interleaved and min-of-reps is taken
# per level: run-to-run variance on this shared sandbox is up to ~3x
# (measured: the identical local[8] run 84.9 s vs 32.7 s minutes apart), so a
# single rep per level can report any efficiency from 0.3 to 1.2.
#
# Input + config are the flagship bench job (100k base pages, 25% dups,
# 60 hosts, 6 comparison variables, block-cap 1000 => ~149M comparisons), so
# the result is directly comparable to BENCH.json's in-session scaling pair.
#
# Usage: tools/run_pipeline_scaling.sh [workdir]
#   env: NBASE=100000 NHOSTS=60 CPUS_N=2 CPUS_4N=8 REPS=2 CPUS_PEAK=32
#        (CPUS_PEAK=0 skips the peak run)
#        REPS_N / REPS_4N — per-level rep override (the 4N level's
#        run-to-run band is ~50% on this host vs ~20% at N, so extra 4N
#        reps buy the most variance reduction per minute)
#        DRIVER_MEM=16g — per-JVM heap; raise for big-NBASE probes the way
#        a real cluster scales executor memory with data (cache mode holds
#        the narrow gamma table at MEMORY_AND_DISK)
#        WARMUP=4N|peak|0 — "peak" runs the measured peak level FIRST and
#        reuses it as the page-cache warmup (saves one unmeasured pass on
#        multi-hour probes); "0" skips warmup entirely
#        GAMMA_MODE=parquet|cache|default — pair-table checkpoint
#        materialization (cache = sufficient-statistics checkpointing, no
#        gamma parquet; default = OMIT the flag and measure whatever the
#        CLI's default resolves to — cache for non-increment runs)
set -euo pipefail

WORK="${1:-/tmp/pipe_scaling}"
NBASE="${NBASE:-100000}"
NHOSTS="${NHOSTS:-60}"
CPUS_N="${CPUS_N:-2}"
CPUS_4N="${CPUS_4N:-8}"
CPUS_PEAK="${CPUS_PEAK:-32}"
REPS="${REPS:-2}"
REPS_N="${REPS_N:-$REPS}"
REPS_4N="${REPS_4N:-$REPS}"
DRIVER_MEM="${DRIVER_MEM:-16g}"
WARMUP="${WARMUP:-4N}"
GAMMA_MODE="${GAMMA_MODE:-parquet}"
SUBMIT=/opt/spark/bin/spark-submit

mkdir -p "$WORK"
# snapshot the compiled classes so an sbt compile during a multi-hour probe
# can't swap class files under a running JVM (classes load lazily)
CLASSES="$WORK/classes_snapshot"
rm -rf "$CLASSES"
cp -r /root/repo/target/scala-2.13/classes "$CLASSES"
PAGES="$WORK/pages.parquet"
CONFIG="$WORK/config.json"

# the flagship 6-variable configuration (Bench.benchSpecs, reference JSON shape)
cat > "$CONFIG" <<'EOF'
{"idvar": ["page_id", "page_id"],
 "link_type": "dedupe_only",
 "comparisons": {"name": "web",
   "threshold_match": 0.85,
   "variables": [
     {"varname": "title",    "method": "jarowinkler", "cut_a": 0.92, "cut_b": 0.88},
     {"varname": "mid3",     "method": "jarowinkler", "cut_a": 0.92, "cut_b": 0.88},
     {"varname": "tail3",    "method": "jarowinkler", "cut_a": 0.92, "cut_b": 0.88},
     {"varname": "tok1",     "method": "exact"},
     {"varname": "lang",     "method": "exact"},
     {"varname": "n_tokens", "method": "numeric", "cut_a": 1, "cut_b": 3}]}}
EOF

submit() { # submit <cpus> <extra-args...>
  local cpus="$1"; shift
  "$SUBMIT" --master "local[$cpus]" --driver-memory "$DRIVER_MEM" \
    --conf spark.driver.extraJavaOptions="-Xms$DRIVER_MEM -XX:+AlwaysPreTouch" \
    --conf spark.sql.shuffle.partitions=64 \
    --conf spark.ui.enabled=false \
    --driver-class-path "$CLASSES" "$@"
}

if [ ! -f "$PAGES/_SUCCESS" ]; then
  echo "[scaling] generating input: nBase=$NBASE nHosts=$NHOSTS" >&2
  submit 16 --class graft.GenPages "$CLASSES" \
    --out "$PAGES" --n-base "$NBASE" --n-hosts "$NHOSTS" >&2
fi

run_level() { # run_level <cpus> <tag> <rep>  -> prints the summary JSON line
  local cpus="$1" tag="$2" rep="$3"
  local ckpt="$WORK/ckpt_${tag}_r${rep}"
  rm -rf "$ckpt"
  local modeargs=()
  [ "$GAMMA_MODE" != default ] && modeargs=(--gamma-checkpoint "$GAMMA_MODE")
  ( cd "$WORK" && submit "$cpus" --class graft.Pipeline "$CLASSES" \
      --input-a "$PAGES" --config "$CONFIG" --block block \
      --max-block-rows 1000 --checkpoint "$ckpt" --fanout 64 \
      "${modeargs[@]}" 2>/dev/null \
      | tail -1 )
  # cache mode writes no gammas stage, so the summary can't read the
  # comparison count from stage rows — recover it as sum(counts) over the
  # aggregated pattern tables before the checkpoint is deleted
  python3 - "$ckpt" > "$WORK/comparisons_${tag}.txt" 2>/dev/null <<'PY' || true
import glob, sys
import pyarrow.parquet as pq
total = 0
for d in glob.glob(sys.argv[1] + "/patterns_*"):
    t = pq.read_table(d, columns=["counts"])
    total += sum(t.column("counts").to_pylist())
print(total)
PY
  rm -rf "$ckpt"   # ~1.5 GB of gamma parquet per run — don't accumulate
}

rm -f "$WORK"/run_N_*.json "$WORK"/run_4N_*.json "$WORK"/run_peak.json

# an unmeasured warmup primes the OS page cache for the input + spark jars,
# so rep 1 of the measured runs isn't the cold outlier; WARMUP=peak instead
# runs the measured peak level first and counts it as the warmup (for
# multi-hour probes where an extra unmeasured pass is unaffordable)
case "$WARMUP" in
  peak)
    echo "[scaling] peak level first, doubling as warmup (local[$CPUS_PEAK])" >&2
    run_level "$CPUS_PEAK" peak 1 > "$WORK/run_peak.json"
    echo "[scaling]   -> $(sed -E 's/.*"sec":([0-9.]+)\}.*/\1/' "$WORK/run_peak.json")s" >&2
    ;;
  0) echo "[scaling] warmup skipped (WARMUP=0)" >&2 ;;
  *)
    echo "[scaling] warmup (local[$CPUS_4N])" >&2
    run_level "$CPUS_4N" warmup 0 > /dev/null
    ;;
esac

MAXREPS=$(( REPS_N > REPS_4N ? REPS_N : REPS_4N ))
for rep in $(seq 1 "$MAXREPS"); do
  for level in "$CPUS_N:N:$REPS_N" "$CPUS_4N:4N:$REPS_4N"; do
    IFS=: read -r cpus tag nreps <<< "$level"
    [ "$rep" -gt "$nreps" ] && continue
    echo "[scaling] rep $rep level $tag (local[$cpus])" >&2
    run_level "$cpus" "$tag" "$rep" > "$WORK/run_${tag}_${rep}.json"
    echo "[scaling]   -> $(sed -E 's/.*"sec":([0-9.]+)\}.*/\1/' "$WORK/run_${tag}_${rep}.json")s" >&2
  done
done

if [ "$CPUS_PEAK" != 0 ] && [ "$WARMUP" != peak ]; then
  echo "[scaling] peak level (local[$CPUS_PEAK])" >&2
  run_level "$CPUS_PEAK" peak 1 > "$WORK/run_peak.json"
  echo "[scaling]   -> $(sed -E 's/.*"sec":([0-9.]+)\}.*/\1/' "$WORK/run_peak.json")s" >&2
fi

WORK="$WORK" CPUS_N="$CPUS_N" CPUS_4N="$CPUS_4N" CPUS_PEAK="$CPUS_PEAK" \
NBASE="$NBASE" NHOSTS="$NHOSTS" GAMMA_MODE="$GAMMA_MODE" \
DRIVER_MEM="$DRIVER_MEM" python3 <<'PYEOF'
import glob, json, os
work = os.environ["WORK"]
cn, c4, cp = int(os.environ["CPUS_N"]), int(os.environ["CPUS_4N"]), int(os.environ["CPUS_PEAK"])

def best_of(tag):
    runs = [json.load(open(f)) for f in glob.glob(f"{work}/run_{tag}_*.json")]
    best = min(runs, key=lambda r: r["sec"])
    return best, sorted(r["sec"] for r in runs)

best_n, all_n = best_of("N")
best_4n, all_4n = best_of("4N")
eff = (best_n["sec"] / best_4n["sec"]) / (c4 / cn)
# cache mode persists no gammas stage — the per-stage breakdown then only
# covers the sufficient-statistics stages; the comparison count is recovered
# from the aggregated pattern tables (comparisons_*.txt, written per level
# before the checkpoint is deleted)
has_gammas = "gammas" in best_n["stages"] and "gammas" in best_4n["stages"]
g_eff = ((best_n["stages"]["gammas"]["sec"] / best_4n["stages"]["gammas"]["sec"])
         / (c4 / cn)) if has_gammas else None
comparisons = best_4n["stages"]["gammas"]["rows"] if has_gammas else None
if comparisons is None:
    for tag in ("4N", "N", "peak"):
        f = f"{work}/comparisons_{tag}.txt"
        if os.path.exists(f):
            v = open(f).read().strip()
            if v.isdigit() and int(v) > 0:
                comparisons = int(v)
                break
out = {
    "job": {"n_base": int(os.environ["NBASE"]), "n_hosts": int(os.environ["NHOSTS"]),
            "config": "flagship 6-variable dedupe (bench parity)",
            "comparisons": comparisons,
            "gamma_checkpoint": os.environ["GAMMA_MODE"],
            "driver_mem": os.environ["DRIVER_MEM"]},
    "protocol": f"spark-submit graft.Pipeline, fresh JVM + fresh checkpoints per run, "
                f"levels interleaved, min of {len(all_n)}/{len(all_4n)} reps per level",
    "cpus_n": cn, "cpus_4n": c4,
    "sec_n": best_n["sec"], "sec_4n": best_4n["sec"],
    "all_sec_n": all_n, "all_sec_4n": all_4n,
    "scaling_efficiency": round(eff, 3),
    "scaling_efficiency_gammas": round(g_eff, 3) if g_eff is not None else None,
    "stage_sec_n": {k: v["sec"] for k, v in best_n["stages"].items()},
    "stage_sec_4n": {k: v["sec"] for k, v in best_4n["stages"].items()},
}
if comparisons:
    out["usec_per_pair_n"] = round(best_n["sec"] * 1e6 / comparisons, 4)
    out["usec_per_pair_4n"] = round(best_4n["sec"] * 1e6 / comparisons, 4)
if cp and os.path.exists(f"{work}/run_peak.json"):
    pj = json.load(open(f"{work}/run_peak.json"))
    out["cpus_peak"] = cp
    out["sec_peak"] = pj["sec"]
    if "gammas" in pj["stages"]:
        out["pairs_per_sec_peak_gammas"] = round(
            pj["stages"]["gammas"]["rows"] / pj["stages"]["gammas"]["sec"])
    elif comparisons:
        out["pairs_per_sec_peak_e2e"] = round(comparisons / pj["sec"])
json.dump(out, open(f"{work}/SCALING.json", "w"), indent=1)
print(json.dumps(out))
PYEOF
