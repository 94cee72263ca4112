#!/bin/bash
# Probe the axon TPU backend until it responds; log each attempt.
LOG=/tmp/tpu_logs/probe.log
mkdir -p /tmp/tpu_logs
for i in $(seq 1 200); do
  echo "=== attempt $i $(date -u +%H:%M:%S) ===" >> "$LOG"
  timeout 180 python -c "
import jax
d = jax.devices()
print('OK', d)
import jax.numpy as jnp
x = jnp.arange(8)
print('compute', jnp.sum(x))
" >> "$LOG" 2>&1
  rc=$?
  echo "rc=$rc" >> "$LOG"
  if [ $rc -eq 0 ]; then echo "TPU_UP" >> "$LOG"; touch /tmp/tpu_logs/UP; exit 0; fi
  sleep 60
done
exit 1
