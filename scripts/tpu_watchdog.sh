#!/bin/bash
# tpu_watchdog.sh TIMEOUT_S CMD...
#
# Run CMD with two kill conditions:
#   exit 124 — TIMEOUT_S wall-clock exceeded;
#   exit 125 — CMD's cumulative CPU time frozen for ~12 min (the axon
#              relay wedge signature: a blocked RPC that never returns;
#              CLAUDE.md "one TPU process at a time" notes).  Legitimate
#              device waits (per-call fetches, compiles) bump host CPU
#              within minutes; 24 identical 30 s samples do not.
#
# CMD runs in its own session (setsid) and kills land on the whole
# process group: a direct-child-only kill -9 left forked helpers
# (compile workers, data loaders) alive holding the axon TPU claim, so
# the retry deadlocked — the exact failure the watchdog exists to
# prevent (ADVICE r4).
t_max=$1; shift
setsid "$@" &
pid=$!
start=$(date +%s)
ref_ticks=-1; frozen=0

kill_group() {
  # setsid made $pid a process-group leader: negative pid = whole group
  kill -9 -- "-$pid" 2>/dev/null || kill -9 "$pid" 2>/dev/null
  wait "$pid" 2>/dev/null
}

cpu_ticks() {
  # utime+stime are fields 14/15 of /proc/pid/stat, but comm (field 2)
  # may contain spaces — parse after the LAST ')' where fields are
  # fixed: state is token 1, so utime/stime are tokens 12/13
  local line rest
  line=$(cat "/proc/$1/stat" 2>/dev/null) || return 1
  rest=${line##*) }
  set -- $rest
  echo $(( ${12:-0} + ${13:-0} ))
}

while kill -0 "$pid" 2>/dev/null; do
  sleep 30
  kill -0 "$pid" 2>/dev/null || break  # exited during the sleep
  now=$(date +%s)
  if [ $((now - start)) -ge "$t_max" ]; then
    echo "watchdog: ${t_max}s timeout — killing group $pid" >&2
    kill_group; exit 124
  fi
  ticks=$(cpu_ticks "$pid")
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
    echo "watchdog: <1s CPU progress in 12 min (relay wedge) — killing group $pid" >&2
    kill_group; exit 125
  fi
done
wait "$pid"
