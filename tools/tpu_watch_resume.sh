#!/usr/bin/env bash
# Keep a long tunneled-TPU training run alive across tunnel outages and
# trainer crashes (docs/OPERATIONS.md; SURVEY.md §5 failure recovery).
#
# Usage:
#   nohup tools/tpu_watch_resume.sh SAVE_DIR FINAL_EPOCH LOG -- \
#       python train.py --save_dir SAVE_DIR ... >/dev/null 2>&1 &
#
# Behavior:
#   * launches the given training command and waits on its PID (never
#     matches processes by name/pattern);
#   * train.py's own host-RSS watchdog re-execs in place (same PID) — that
#     restart is invisible to this script, as intended;
#   * if the trainer EXITS before SAVE_DIR/model_FINAL_EPOCH exists (tunnel
#     outage, OOM kill, crash), probes the TPU with a bounded `timeout`
#     (tunnel backend-init hangs otherwise — CLAUDE.md trap) until it is
#     reachable, then relaunches the SAME command with a bare --resume;
#   * if the trainer is ALIVE but its log has been silent for
#     KGTPU_WATCH_STALL_MIN minutes (default 15) while a fresh TPU probe
#     succeeds, kills it — and its whole process group, so a wrapper-
#     launched trainer can't leak the real wedged python — and lets the
#     relaunch path resume it: a dispatch RPC can wedge forever while the
#     tunnel itself is healthy (measured 2026-08-20: 17 min frozen
#     mid-epoch, zero host CPU, while a separate process used the TPU
#     fine).  The threshold must exceed the longest legitimate log gap —
#     startup dataset stats + first compile (~5 min); the in-train eval
#     heartbeats per chunk (train.py run_eval), so a slow-tunnel eval
#     (measured 23 min for 32 imgs) no longer reads as a stall;
#   * exits 0 once model_FINAL_EPOCH is finalized on disk (orbax writes are
#     atomic renames, so the directory existing means it is complete).
set -u
SAVE_DIR=$1; FINAL=$2; LOG=$3; shift 3
[ "${1:-}" = "--" ] && shift

# Knobs, validated up front: under `set -u` without `set -e` a non-integer
# value would otherwise fail the $(( )) assignment NON-fatally, leave the
# variable unset, and silently disable stall detection for the whole run.
STALL_MIN=${KGTPU_WATCH_STALL_MIN:-15}
TICK_S=${KGTPU_WATCH_TICK_S:-60}     # monitor loop period
GRACE_S=${KGTPU_WATCH_GRACE_S:-15}   # TERM -> KILL grace
for kv in "KGTPU_WATCH_STALL_MIN=$STALL_MIN" "KGTPU_WATCH_TICK_S=$TICK_S" \
          "KGTPU_WATCH_GRACE_S=$GRACE_S"; do
  case "${kv#*=}" in (""|*[!0-9]*)
    echo "watcher: ${kv%%=*} must be a non-negative integer (got '${kv#*=}')" >&2
    exit 2;;
  esac
done
STALL_S=$(( STALL_MIN * 60 ))
# test/debug override in seconds (takes precedence over the minutes knob)
case "${KGTPU_WATCH_STALL_S:-}" in
  ("") ;;
  (*[!0-9]*) echo "watcher: KGTPU_WATCH_STALL_S must be an integer" >&2; exit 2;;
  (*) STALL_S=$KGTPU_WATCH_STALL_S;;
esac

probe_tpu() { timeout 180 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; }
done_yet()  { [ -d "$SAVE_DIR/model_$FINAL" ]; }
# alive = PID exists and is not a zombie (a kill -0 check alone would spin
# forever on the un-reaped child after it dies).  Single /proc read: two
# reads would race a process exiting between them.
alive() { local s; s=$(awk '{print $3}' "/proc/$1/stat" 2>/dev/null)
          [ -n "$s" ] && [ "$s" != "Z" ]; }

attempt=0
while ! done_yet; do
  CMD=("$@")
  # resume when any FINALIZED checkpoint already exists (also makes
  # re-arming the watcher against a half-finished run idempotent).  The
  # glob must not match in-flight model_N.orbax-checkpoint-tmp-* dirs — a
  # crash mid-first-write would otherwise --resume into "no checkpoints"
  # and crash-loop instead of restarting fresh.
  if ls "$SAVE_DIR" 2>/dev/null | grep -qE '^model_[0-9]+$'; then
    CMD+=(--resume)
  fi
  echo "$(date -Is) watcher: launch attempt $attempt: ${CMD[*]}" >>"$LOG"
  # setsid: the trainer gets its own process group (pgid == pid), so the
  # stall kill below can take out the WHOLE tree — launching via a wrapper
  # (bash -c, a runner script) would otherwise leave the real wedged
  # python alive, holding the tunnel, while we relaunch a second trainer
  # into the same save_dir.
  setsid "${CMD[@]}" >>"$LOG" 2>&1 &
  tpid=$!
  while alive "$tpid"; do
    sleep "$TICK_S"
    age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || date +%s) ))
    if [ "$age" -ge "$STALL_S" ] && probe_tpu; then
      echo "$(date -Is) watcher: log silent ${age}s with TPU reachable — killing wedged trainer pgid $tpid" >>"$LOG"
      kill -- -"$tpid" 2>/dev/null || kill "$tpid" 2>/dev/null
      sleep "$GRACE_S"
      kill -9 -- -"$tpid" 2>/dev/null || kill -9 "$tpid" 2>/dev/null
    fi
  done
  wait "$tpid"
  rc=$?
  echo "$(date -Is) watcher: trainer exited rc=$rc" >>"$LOG"
  attempt=$((attempt + 1))
  done_yet && break
  until probe_tpu; do
    echo "$(date -Is) watcher: TPU unreachable, re-probing in 120s" >>"$LOG"
    sleep 120
  done
  sleep 10
done
echo "$(date -Is) watcher: $SAVE_DIR/model_$FINAL present — done" >>"$LOG"
