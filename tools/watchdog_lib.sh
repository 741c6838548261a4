# Stall watchdog for long TPU runs (source this, then call wd_train).
#
# The axon tunnel intermittently hangs a training process hard (futex wait,
# 0% CPU, no log progress — observed twice during the round-5 closure runs,
# both near probe events).  wd_train monitors the run's log mtime and, on a
# stall > STALL_SEC, kills the exact PID it spawned and relaunches the same
# command with --resume appended, so a hang costs <= (STALL_SEC + time since
# last checkpoint) instead of a babysitter's attention.
#
# Usage:  wd_train <logfile> <cmd...>
# Env:    STALL_SEC (default 900), MAX_RETRY (default 6)
#
# Notes:
#  - kills only the exact PID it started (repo rule: never kill by pattern)
#  - --resume with no checkpoint on disk starts fresh (cli/train.py:408-417)
#  - the stall check also requires >STALL_SEC since launch, so a pre-existing
#    stale log from the previous attempt can't false-trigger during compile

wd_train () {
  local log=$1; shift
  local -a cmd=("$@")
  local tries=0
  while true; do
    local launch=$(date +%s)
    "${cmd[@]}" &
    local pid=$!
    local stalled=0
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      local now=$(date +%s)
      if [ $((now - launch)) -gt "${STALL_SEC:-900}" ] && [ -f "$log" ]; then
        local age=$((now - $(stat -c %Y "$log")))
        if [ "$age" -gt "${STALL_SEC:-900}" ]; then
          echo "WATCHDOG: $log stalled ${age}s — killing pid $pid, will resume"
          kill "$pid" 2>/dev/null
          sleep 20
          kill -9 "$pid" 2>/dev/null
          stalled=1
          break
        fi
      fi
    done
    local rc=0
    wait "$pid" 2>/dev/null || rc=$?
    if [ "$stalled" -eq 0 ] && [ "$rc" -eq 0 ]; then
      return 0
    fi
    tries=$((tries + 1))
    echo "WATCHDOG: attempt $tries ended (stalled=$stalled rc=$rc)"
    if [ "$tries" -ge "${MAX_RETRY:-6}" ]; then
      echo "WATCHDOG: giving up after $tries attempts"
      return 1
    fi
    sleep 45  # let the tunnel clear before reconnecting
    case " ${cmd[*]} " in
      *" --resume "*) ;;
      *) cmd+=(--resume) ;;
    esac
  done
}
