#!/bin/bash
# Round-5 chip-bound artifact pipeline. Launched detached alongside the
# flagship dynamic watchdog; waits for the chip to free up, then produces
# every remaining round-5 artifact in sequence so the TPU never sits idle
# between a long run finishing and the next one starting.
#
# Stage order is VERDICT-r4 priority order, so a round boundary mid-pipeline
# cuts the LEAST important tail (curation is incremental after every stage):
#
#   1. evaluate-CLI end-to-end on the dynamic flagship checkpoint
#      (VERDICT r4 #2 — the one surface never exercised on a real ckpt)
#   2. v5e-8 projection from the dynamic run's converged operating point
#      (VERDICT r4 #6)
#   3. static-sharp carve run (VERDICT r4 #4/#8: a checkpoint that carves);
#      3,500 steps — the carve signal (grid fill, surviving samples/ray)
#      saturates early; PSNR ceiling is not this stage's goal
#   4. RENDER bench on the carved checkpoint at reference scale (802x550)
#      + the dynamic flagship checkpoint as the deformation/adversarial case
#   5. evaluate-CLI on the carved checkpoint
#
# Raw outputs land in /tmp/r5_artifacts/; curate_r5.py copies the curated
# subset into the repo root after every stage.
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

# newest dynamic flagship run (the timestep-carrier-fixed relaunch creates a
# fresh run dir after NERS-001, whose 9.4k steps trained under the subnormal
# bug and are kept only as evidence)
dyn_run=$(ls -d "$NERSEMBLE_MODELS_PATH"/nersemble/*quality-dynamic* \
          2>/dev/null | sort | tail -1 | xargs -r basename)
dyn_run=${dyn_run:-NERS-001-quality-dynamic}

# -- 1. evaluate CLI end-to-end on the dynamic flagship ----------------------
log "evaluate CLI on $dyn_run"
python -m nersemble_tpu.scripts.evaluate_nersemble "$dyn_run" \
    > "$ART/evaluate_dynamic.log" 2>&1
log "evaluate (dynamic) rc=$?"
python scripts/curate_r5.py

# -- 2. v5e-8 projection at the dynamic run's converged operating point ------
log "projection from $dyn_run"
python scripts/bench_projection.py \
    --from-run "$NERSEMBLE_MODELS_PATH/nersemble/$dyn_run" \
    > "$ART/projection_dynamic.json" 2> "$ART/projection_dynamic.err"
log "projection rc=$?"
python scripts/curate_r5.py

# -- 3. static-sharp carve run ----------------------------------------------
# Run the watchdog in the background and arm a hang guard on it: the crash
# watchdog only handles a trainer that EXITS; a wedged tunnel would stall
# this whole chain silently without the guard (same failure mode the
# flagship run guards against).
log "static-sharp carve run (3500 steps)"
bash scripts/quality_watchdog.sh static 3500 "$PWD/QUALITY_r5.json" \
    --texture-style sharp --eval-every 500 \
    > "$ART/static_sharp_train.log" 2>&1 &
carve_wd=$!
bash scripts/hang_guard.sh "$carve_wd" \
    "$NERSEMBLE_MODELS_PATH/nersemble/*quality-static-sharp*/metrics.jsonl" \
    > "$ART/hang_guard_sharp.log" 2>&1 &
carve_hg=$!
wait "$carve_wd"
log "static-sharp run rc=$?"
kill "$carve_hg" 2>/dev/null

sharp_run=$(ls -d "$NERSEMBLE_MODELS_PATH"/nersemble/*quality-static-sharp \
            2>/dev/null | sort | tail -1 | xargs -r basename)

# -- 4. render fps at reference scale ---------------------------------------
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

# -- 5. evaluate CLI on the carved checkpoint ---------------------------------
if [ -n "$sharp_run" ]; then
    log "evaluate CLI on $sharp_run"
    python -m nersemble_tpu.scripts.evaluate_nersemble "$sharp_run" \
        > "$ART/evaluate_sharp.log" 2>&1
    log "evaluate (sharp) rc=$?"
fi

# -- 6. final curation into the repo ------------------------------------------
log "curating artifacts into the repo"
python scripts/curate_r5.py
log "curation rc=$?"

log "pipeline complete; artifacts in $ART + repo root"
