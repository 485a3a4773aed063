#!/bin/bash
# Crash-resuming wrapper for long quality runs on the axon TPU tunnel.
#
# The tunnel sporadically kills the TPU worker mid-run (UNAVAILABLE: "TPU
# worker process crashed or restarted" — PERF.md "axon tunnel quirks"); a
# 20k-step run takes ~3 h and has died this way twice in round 4. The
# trainer checkpoints every 2,500 steps and quality_benchmark.py grew
# --resume-run, so the recovery loop is mechanical: wait out the poisoned
# device window, find the latest run dir for the mode, resume it.
#
# Usage: scripts/quality_watchdog.sh <mode> <steps> <out.json> [extra args...]
# RESUME_FIRST=1: resume the latest run for the mode on the FIRST attempt
# too (picking up after a hung/killed process from a previous launch).
set -u
mode=$1; steps=$2; out=$3; shift 3
cd "$(dirname "$0")/.."
models_root=${NS_QUALITY_MODELS:-/tmp/ns_quality_models}

for attempt in $(seq 1 12); do
    if [ "$attempt" -eq 1 ] && [ -z "${RESUME_FIRST:-}" ]; then
        python scripts/quality_benchmark.py --mode "$mode" --steps "$steps" \
            --out "$out" "$@"
    else
        # trailing * so texture-style suffixed runs (…-quality-static-sharp)
        # are resumable too
        run=$(ls -d "$models_root"/nersemble/*quality-"$mode"* 2>/dev/null \
              | sort | tail -1 | xargs -r basename)
        if [ -z "$run" ] || [ -z "$(ls "$models_root/nersemble/$run/checkpoints" 2>/dev/null)" ]; then
            # crashed before the first periodic save: start over
            python scripts/quality_benchmark.py --mode "$mode" \
                --steps "$steps" --out "$out" "$@"
        else
            python scripts/quality_benchmark.py --mode "$mode" \
                --steps "$steps" --out "$out" --resume-run "$run" "$@"
        fi
    fi
    rc=$?
    if [ $rc -eq 0 ]; then
        echo "[watchdog] run completed (attempt $attempt)"
        exit 0
    fi
    echo "[watchdog] attempt $attempt exited rc=$rc; sleeping 180 s for the device to recover"
    sleep 180
done
echo "[watchdog] giving up after 12 attempts"
exit 1
