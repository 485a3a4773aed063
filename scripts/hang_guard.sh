#!/bin/bash
# Hang guard for a watchdog-supervised quality run. The crash watchdog
# (quality_watchdog.sh) resumes a run whose trainer EXITS, but a wedged axon
# tunnel can leave the trainer alive and silent forever (observed round 4:
# a hung run needed manual RESUME_FIRST recovery). This guard watches the
# run's metrics.jsonl mtime and kills the watchdog's trainer CHILD (exact
# PID from /proc — never pattern-matched) when it goes stale, letting the
# watchdog's normal resume path take over.
#
# The threshold must exceed every legitimate silent window: flagship
# checkpoint saves (~290 s), all-image evals (~90 s), and a cold resume
# (checkpoint reload over the tunnel + remote recompile, ~20 min observed).
#
# Usage: hang_guard.sh <watchdog_pid> <metrics.jsonl path-or-glob> [stale_minutes]
# A glob (quoted!) is re-resolved to the newest matching file every cycle, so
# the guard keeps tracking the live run when the watchdog starts a FRESH run
# dir after a pre-first-checkpoint crash (a pinned path would go permanently
# stale and the guard would then kill the healthy new trainer forever).
set -u
wd_pid=$1; metrics_pat=$2; stale_min=${3:-35}

children_of() { cat /proc/$1/task/*/children 2>/dev/null; }

while kill -0 "$wd_pid" 2>/dev/null; do
    sleep 300
    metrics=$(ls -t $metrics_pat 2>/dev/null | head -1)
    [ -n "$metrics" ] && [ -f "$metrics" ] || continue
    age=$(( $(date +%s) - $(stat -c %Y "$metrics") ))
    if [ "$age" -gt $((stale_min * 60)) ]; then
        for child in $(children_of "$wd_pid"); do
            echo "[hang-guard $(date +%H:%M:%S)] metrics stale ${age}s;" \
                 "killing trainer pid $child (watchdog will resume)"
            kill "$child" 2>/dev/null
        done
        sleep 600  # give the resume its own silent window before re-arming
    fi
done
echo "[hang-guard] watchdog $wd_pid gone; exiting"
