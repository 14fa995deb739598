#!/bin/bash
# tpu_watchdog.sh TIMEOUT_S CMD...
#
# Run CMD with two kill conditions:
#   exit 124 — TIMEOUT_S wall-clock exceeded;
#   exit 125 — CMD's cumulative CPU time frozen for ~600 s (the axon
#              relay wedge signature: a blocked RPC that never returns;
#              CLAUDE.md "one TPU process at a time" notes).  Legitimate
#              device waits (per-call fetches, compiles) bump host CPU
#              within minutes; 20 identical 30 s samples do not.
t_max=$1; shift
"$@" &
pid=$!
start=$(date +%s)
ref_ticks=-1; frozen=0
while kill -0 "$pid" 2>/dev/null; do
  sleep 30
  now=$(date +%s)
  if [ $((now - start)) -ge "$t_max" ]; then
    echo "watchdog: ${t_max}s timeout — killing $pid" >&2
    kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null; exit 124
  fi
  ticks=$(awk '{print $14+$15}' "/proc/$pid/stat" 2>/dev/null)
  [ -z "$ticks" ] && break
  # a wedged process still collects the odd stray tick, so compare
  # against a sliding reference: <1 s of CPU (100 ticks) across 24
  # consecutive 30 s samples (12 min) = wedged.  Long device-side
  # compiles idle the host too — the 12 min bar stays above every
  # compile observed on this chip, and a falsely killed step is
  # retried by the caller anyway.
  if [ "$ref_ticks" -lt 0 ]; then ref_ticks=$ticks; fi
  if [ $((ticks - ref_ticks)) -ge 100 ]; then
    ref_ticks=$ticks; frozen=0
  else
    frozen=$((frozen + 1))
  fi
  if [ "$frozen" -ge 24 ]; then
    echo "watchdog: <1s CPU progress in 12 min (relay wedge) — killing $pid" >&2
    kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null; exit 125
  fi
done
wait "$pid"
