#!/usr/bin/env bash
# End-of-round record cut for the committed benchmark artifacts:
#   SCALEPROBE_r{N}.json, BENCH_SF1.json, BENCH_SF1_NOBASE.json,
#   BENCH_DETAIL.json (sf0.1), PLANS.md.
#
# Encodes the round-15 protocol so it stops living in session memory:
#  * host gate first — this VM has co-tenant windows where identical
#    work burns ~60% more CPU-seconds (r15's committed record was cut
#    at load1 3.3→11 and read 3x the idle-window wall). Refuse to cut
#    unless load1 is low; every artifact carries host columns anyway.
#  * ScaleProbe in TWO phases — the 10x corpus build leaves the
#    measuring JVM with a loaded old generation and the string-heavy
#    entries then measure GC backpressure, not plans (q_line_dedup:
#    15-55x build-then-measure vs ~1.4x fresh). Build once (numbers
#    discarded), then measure under SPARK_GRAFT_PROBE_REUSE=1.
#  * Bench at ANY sf overwrites BENCH_DETAIL.json in cwd — cut sf1
#    (and its NOBASE variant) FIRST, copy them aside, then cut sf0.1
#    LAST so the committed BENCH_DETAIL is the sf0.1 record. A stray
#    smoke run after this script clobbers it again; restore with
#    `git checkout -- BENCH_DETAIL.json`.
#  * The sf1 dir IS the probe's 10x corpus (/tmp/graft_scaleprobe);
#    the NOBASE variant skips the two documented exact-baseline
#    entries (all-pairs by design, solo-columned in SURVEY §6).
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND=${1:?usage: scripts/cut_records.sh <round-number> [phase...]
  phases (default: all): probe sf1 nobase sf01 streambench plans}
shift || true
PHASES=${*:-probe sf1 nobase sf01 streambench plans}

SF01=${SPARK_GRAFT_SF01:-/root/testdata/sf0.1}
SF1=${SPARK_GRAFT_SF1:-/tmp/graft_scaleprobe}
MAX_LOAD=${GRAFT_CUT_MAX_LOAD:-2.0}

# Wait for load1 to settle below MAX_LOAD (our own previous phase's load
# takes ~5 min to decay out of load1), then gate. Only a host that stays
# busy past the settle window — a co-tenant, not our own wake — fails.
gate() {
  local load1 waited=0
  while :; do
    load1=$(awk '{print $1}' /proc/loadavg)
    if ! awk -v l="$load1" -v m="$MAX_LOAD" 'BEGIN{exit !(l > m)}'; then
      echo "cut_records: host ok before $1 (load1=$load1)"
      return 0
    fi
    if [ "$waited" -ge "${GRAFT_CUT_SETTLE_SEC:-900}" ]; then
      echo "cut_records: host busy (load1=$load1 > $MAX_LOAD) before $1" \
           "after ${waited}s settle — refusing; re-run when idle or" \
           "raise GRAFT_CUT_MAX_LOAD" >&2
      exit 1
    fi
    sleep 30; waited=$((waited + 30))
  done
}

has() { case " $PHASES " in *" $1 "*) return 0;; *) return 1;; esac; }

if has probe; then
  # phase 1 (corpus build) can be skipped when the stamped corpus is
  # already fresh — ScaleProbe's REUSE path verifies the stamp itself,
  # so a stale corpus would still rebuild in phase 2
  if [ "$(cat "$SF1/.probe_stamp" 2>/dev/null)" != \
       "factor=10 src=$SF01" ]; then
    gate "probe build"
    echo "cut_records: ScaleProbe phase 1/2 (corpus build, numbers discarded)"
    sbt -batch "runMain graft.ScaleProbe" > /tmp/cut_probe_build.log 2>&1 \
      || { tail -20 /tmp/cut_probe_build.log >&2; exit 1; }
  else
    echo "cut_records: probe corpus stamp fresh — skipping the build phase"
  fi
  gate "probe measure"
  echo "cut_records: ScaleProbe phase 2/2 (fresh-JVM measure)"
  SPARK_GRAFT_PROBE_REUSE=1 sbt -batch "runMain graft.ScaleProbe" \
    > /tmp/cut_probe_measure.log 2>&1 \
    || { tail -20 /tmp/cut_probe_measure.log >&2; exit 1; }
  grep -o '{"metric":"scaleprobe".*}' /tmp/cut_probe_measure.log \
    | tail -1 > "SCALEPROBE_r${ROUND}.json"
  [ -s "SCALEPROBE_r${ROUND}.json" ] \
    || { echo "cut_records: no scaleprobe JSON line" >&2; exit 1; }
fi

# Bench at ANY sf overwrites BENCH_DETAIL.json in cwd. When this run's
# phase list includes a bench phase but NOT sf01, the sf0.1 record
# would be silently clobbered by the sf1/nobase side effect (it struck
# the committed artifact in r15 and twice in r18's partial re-runs) —
# stash it up front and restore after.
RESTORE_DETAIL=""
if { has sf1 || has nobase; } && ! has sf01 \
   && [ -f BENCH_DETAIL.json ]; then
  cp BENCH_DETAIL.json /tmp/cut_records_detail_stash.json
  RESTORE_DETAIL=1
fi

if has sf1; then
  gate "sf1 bench"
  echo "cut_records: Bench sf1 (dir=$SF1)"
  SPARK_GRAFT_SF_DIR="$SF1" sbt -batch "runMain graft.Bench" \
    > /tmp/cut_bench_sf1.log 2>&1 \
    || { tail -20 /tmp/cut_bench_sf1.log >&2; exit 1; }
  cp BENCH_DETAIL.json BENCH_SF1.json
fi

if has nobase; then
  gate "sf1 nobase bench"
  echo "cut_records: Bench sf1 NOBASE (skip exact-baseline entries)"
  SPARK_GRAFT_SF_DIR="$SF1" \
    SPARK_GRAFT_SKIP=q_dedup_embed,q_dedup_embed_lsh \
    sbt -batch "runMain graft.Bench" > /tmp/cut_bench_nobase.log 2>&1 \
    || { tail -20 /tmp/cut_bench_nobase.log >&2; exit 1; }
  cp BENCH_DETAIL.json BENCH_SF1_NOBASE.json
fi

if has sf01; then
  gate "sf0.1 bench"
  echo "cut_records: Bench sf0.1 (dir=$SF01) — the committed BENCH_DETAIL"
  SPARK_GRAFT_SF_DIR="$SF01" sbt -batch "runMain graft.Bench" \
    > /tmp/cut_bench_sf01.log 2>&1 \
    || { tail -20 /tmp/cut_bench_sf01.log >&2; exit 1; }
fi

if [ -n "$RESTORE_DETAIL" ]; then
  cp /tmp/cut_records_detail_stash.json BENCH_DETAIL.json
  echo "cut_records: restored BENCH_DETAIL.json (sf0.1 record) after" \
       "the sf1-side bench phases"
fi

if has streambench; then
  # settled streaming record: the in-Bench probes run on the query
  # suite's decaying load and read 25-45% low on busy windows; this
  # phase runs the same probes in a fresh gated JVM (same position-
  # for-position neighborhood as the full run — no per-probe solo
  # filtering, which cold-JIT distorts)
  gate "streambench"
  echo "cut_records: StreamBench (settled, fresh JVM)"
  sbt -batch "runMain graft.StreamBench" > /tmp/cut_streambench.log 2>&1 \
    || { tail -20 /tmp/cut_streambench.log >&2; exit 1; }
  grep -o '{"metric":"streambench".*}' /tmp/cut_streambench.log \
    | tail -1 > "STREAMBENCH_r${ROUND}.json"
  [ -s "STREAMBENCH_r${ROUND}.json" ] \
    || { echo "cut_records: no streambench JSON line" >&2; exit 1; }
fi

if has plans; then
  echo "cut_records: regenerating PLANS.md"
  sbt -batch "runMain graft.Explain" > /tmp/cut_plans.log 2>&1 \
    || { tail -20 /tmp/cut_plans.log >&2; exit 1; }
fi

echo "cut_records: done. Summary:"
for f in "SCALEPROBE_r${ROUND}.json" BENCH_SF1.json BENCH_SF1_NOBASE.json \
         BENCH_DETAIL.json "STREAMBENCH_r${ROUND}.json"; do
  [ -f "$f" ] && python3 - "$f" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
if d.get("metric") == "scaleprobe":
    qs = d["queries"]
    # documented baselines (exhaustive by construction) sit outside the
    # <=2.5x contract — keep ScaleProbe.Baselines in sync
    baselines = {"q_ann_pq"}
    bad = {k: v for k, v in qs.items()
           if k not in baselines
           and isinstance(v, dict) and v.get("ratio", 0) > 2.5}
    print(f"{sys.argv[1]}: {len(qs)} entries, >2.5x (non-baseline): "
          f"{ {k: round(v['ratio'],2) for k,v in bad.items()} or 'none'}")
elif d.get("metric") == "streambench":
    ps = d["probes"]
    slow = min(ps.items(), key=lambda kv: kv[1]["rows_per_sec"])
    print(f"{sys.argv[1]}: {len(ps)} probes, slowest "
          f"{slow[0]} {slow[1]['rows_per_sec']:.0f} rows/s")
else:
    h = d.get("host", {})
    print(f"{sys.argv[1]}: run1 {d['run1']['total']:.1f}s "
          f"run2 {d['run2']['total']:.1f}s load1_start "
          f"{h.get('load1_start')} util {h.get('run2_util')}")
EOF
done
echo "cut_records: update the SURVEY.md round-status header, then commit."
