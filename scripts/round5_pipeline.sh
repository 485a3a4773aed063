#!/bin/bash
# Round-5 chip-bound artifact pipeline. Launched detached alongside the
# flagship dynamic watchdog; waits for the chip to free up, then produces
# every remaining round-5 artifact in sequence so the TPU never sits idle
# between a long run finishing and the next one starting:
#
#   1. static-sharp carve run (VERDICT r4 #4/#8: a checkpoint that carves)
#   2. RENDER bench on the carved checkpoint at reference scale (802x550)
#      + the dynamic flagship checkpoint as the adversarial/fog case
#   3. evaluate-CLI end-to-end on both trained checkpoints (VERDICT r4 #2)
#   4. v5e-8 projection from the dynamic run's converged operating point
#      (VERDICT r4 #6)
#
# Raw outputs land in /tmp/r5_artifacts/; curation + commits stay manual.
set -u
cd "$(dirname "$0")/.."
export NERSEMBLE_DATA_PATH=${NERSEMBLE_DATA_PATH:-/tmp/ns_quality_data}
export NERSEMBLE_MODELS_PATH=${NERSEMBLE_MODELS_PATH:-/tmp/ns_quality_models}
ART=/tmp/r5_artifacts
mkdir -p "$ART"

log() { echo "[pipeline $(date +%H:%M:%S)] $*"; }

# -- 0. wait for the dynamic watchdog (and any trainer it supervises) -------
if [ -f /tmp/dyn_watchdog.pid ]; then
    pid=$(cat /tmp/dyn_watchdog.pid)
    log "waiting for dynamic watchdog pid $pid"
    while kill -0 "$pid" 2>/dev/null; do sleep 60; done
    log "dynamic watchdog exited"
fi
sleep 30  # let the device settle after the long run

# -- 1. static-sharp carve run ----------------------------------------------
# Run the watchdog in the background and arm a hang guard on it: the crash
# watchdog only handles a trainer that EXITS; a wedged tunnel would stall
# this whole chain silently without the guard (same failure mode the
# flagship run guards against).
log "static-sharp carve run (6000 steps)"
bash scripts/quality_watchdog.sh static 6000 "$PWD/QUALITY_r5.json" \
    --texture-style sharp --eval-every 500 \
    > "$ART/static_sharp_train.log" 2>&1 &
carve_wd=$!
bash scripts/hang_guard.sh "$carve_wd" \
    "$NERSEMBLE_MODELS_PATH/nersemble/*quality-static-sharp*/metrics.jsonl" \
    > "$ART/hang_guard_sharp.log" 2>&1 &
wait "$carve_wd"
log "static-sharp run rc=$?"

sharp_run=$(ls -d "$NERSEMBLE_MODELS_PATH"/nersemble/*quality-static-sharp \
            2>/dev/null | sort | tail -1 | xargs -r basename)
# newest dynamic flagship run (the timestep-carrier-fixed relaunch creates a
# fresh run dir after NERS-001, whose 9.4k steps trained under the subnormal
# bug and are kept only as evidence)
dyn_run=$(ls -d "$NERSEMBLE_MODELS_PATH"/nersemble/*quality-dynamic* \
          2>/dev/null | sort | tail -1 | xargs -r basename)
dyn_run=${dyn_run:-NERS-001-quality-dynamic}

# -- 2. render fps at reference scale ---------------------------------------
if [ -n "$sharp_run" ]; then
    log "render bench on $sharp_run"
    python scripts/bench_render.py --run "$sharp_run" \
        --resolution 802 550 --frames 8 \
        > "$ART/render_sharp.json" 2> "$ART/render_sharp.err"
    log "render bench (sharp) rc=$?"
fi
log "render bench on $dyn_run (dynamic/deformation case)"
python scripts/bench_render.py --run "$dyn_run" \
    --resolution 802 550 --frames 4 \
    > "$ART/render_dynamic.json" 2> "$ART/render_dynamic.err"
log "render bench (dynamic) rc=$?"
python scripts/curate_r5.py

# -- 3. v5e-8 projection at the dynamic run's converged operating point ------
log "projection from $dyn_run"
python scripts/bench_projection.py \
    --from-run "$NERSEMBLE_MODELS_PATH/nersemble/$dyn_run" \
    > "$ART/projection_dynamic.json" 2> "$ART/projection_dynamic.err"
log "projection rc=$?"
python scripts/curate_r5.py

# -- 4. evaluate CLI end-to-end on both checkpoints --------------------------
log "evaluate CLI on $dyn_run"
python -m nersemble_tpu.scripts.evaluate_nersemble "$dyn_run" \
    > "$ART/evaluate_dynamic.log" 2>&1
log "evaluate (dynamic) rc=$?"
if [ -n "$sharp_run" ]; then
    log "evaluate CLI on $sharp_run"
    python -m nersemble_tpu.scripts.evaluate_nersemble "$sharp_run" \
        > "$ART/evaluate_sharp.log" 2>&1
    log "evaluate (sharp) rc=$?"
fi
python scripts/curate_r5.py

# -- 5. final curation into the repo ------------------------------------------
# scripts/curate_r5.py is idempotent and also runs after every stage above,
# so a round boundary mid-pipeline loses at most the stage in flight; the
# driver commits whatever is curated.
log "curating artifacts into the repo"
python scripts/curate_r5.py
log "curation rc=$?"

log "pipeline complete; artifacts in $ART + repo root"
