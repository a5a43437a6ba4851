#!/bin/bash
# Serialized TPU job runner: waits for chip liveness before each job, runs
# jobs one per fresh process, never kills a job mid-flight (jobs must bound
# their own work).  Usage: chip_runner.sh LOGFILE -- cmd... [--- cmd...]
log="$1"; shift; shift  # drop LOG and --

wait_alive() {
  for i in $(seq 1 30); do
    if timeout 100 python -c "
import numpy as np, jax, jax.numpy as jnp
np.asarray(jax.jit(lambda a: a@a)(jnp.ones((256,256))))
print('ALIVE')" 2>/dev/null | grep -q ALIVE; then
      return 0
    fi
    echo "$(date +%H:%M:%S) chip not alive, waiting..." >> "$log"
    sleep 45
  done
  return 1
}

# split remaining args on --- into commands
cmd=()
run_one() {
  echo "$(date +%H:%M:%S) RUN: ${cmd[*]}" >> "$log"
  wait_alive || { echo "chip never recovered" >> "$log"; return 1; }
  "${cmd[@]}" >> "$log" 2>&1
  echo "$(date +%H:%M:%S) rc=$?" >> "$log"
}

for a in "$@"; do
  if [ "$a" = "---" ]; then
    run_one
    cmd=()
  else
    cmd+=("$a")
  fi
done
[ ${#cmd[@]} -gt 0 ] && run_one
echo "$(date +%H:%M:%S) ALL DONE" >> "$log"
