#!/bin/bash
# retry_run.sh TIMEOUT_S TRIES LABEL LOG -- cmd args...
#
# Queue-leg wrapper: run `timeout TIMEOUT_S cmd...`, retrying up to TRIES
# times with linear backoff when the leg fails in a way that looks
# TRANSIENT (remote-compile helper HTTP 500, UNAVAILABLE / Unexpected EOF
# tunnel drops, rc=124 timeouts whose next attempt hits a warm cache).
# Round 4 lost two productive legs to one-shot failures of exactly these
# kinds (VERDICT r4 weak #8); both would have succeeded on retry.
#
# Exit code: the last attempt's rc (0 on success).
set -u
T=$1; TRIES=$2; LABEL=$3; LOG=$4; shift 5   # the 5th arg is the literal --
rc=1
for attempt in $(seq 1 "$TRIES"); do
  echo "--- $LABEL attempt $attempt/$TRIES $(date) ---" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  rc=$?
  echo "--- $LABEL attempt $attempt rc=$rc $(date) ---" >> "$LOG"
  [ $rc -eq 0 ] && break
  # transient-failure heuristics: retry on timeout (124), or when the log
  # tail shows a toolchain/tunnel flake; give up on real Python errors
  tail_txt=$(tail -40 "$LOG")
  if [ $rc -ne 124 ] && ! echo "$tail_txt" | grep -qE \
      "HTTP 500|UNAVAILABLE|Unexpected EOF|DEADLINE_EXCEEDED|Connection reset|remote_compile"; then
    echo "--- $LABEL rc=$rc looks permanent; not retrying ---" >> "$LOG"
    break
  fi
  sleep $((60 * attempt))
done
exit $rc
