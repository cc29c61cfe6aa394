#!/bin/bash
# Chip validation queue: wait for the TPU tunnel, then run every
# on-chip gate and benchmark in order, logging to $1 (default
# /tmp/chip_validation.log). Designed to be fired in the background
# during a tunnel outage: it probes every POLL seconds (bounded probes
# — a downed axon backend hangs ~30 min per attempt otherwise) and
# starts the queue on the first success.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/chip_validation.log}"
POLL="${POLL:-600}"
MAX_WAIT="${MAX_WAIT:-28800}"  # give up after 8 h

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

probe() {
  # must COMPILE, not just init: the round-5 outage mode has backend
  # init + device listing working while every first-compile hangs
  # (remote compile helper down mid-libtpu-upgrade)
  timeout 240 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() != 'cpu'
assert float(jax.jit(lambda v: v.sum())(jnp.arange(8.0))) == 28.0" \
    >/dev/null 2>&1
}

log "waiting for the TPU tunnel (poll ${POLL}s, max ${MAX_WAIT}s)"
SECONDS=0
until probe; do
  sleep "$POLL"
  if [ "$SECONDS" -ge "$MAX_WAIT" ]; then
    log "GAVE UP: tunnel still down after ${SECONDS}s"
    exit 1
  fi
  log "still down (${SECONDS}s elapsed)"
done
log "TUNNEL UP — running the validation queue"

run() {
  local name="$1"; shift
  log "=== $name: $*"
  timeout 5400 "$@" >> "$LOG" 2>&1
  log "=== $name exit=$?"
}

# (r5 session-2: the warp/cyclespin A/Bs are DECIDED and shipped —
# prod now IS the winning form; keep the harnesses for regression A/B
# by hand.  nlm_ab still earns its slot: the dot-mode kernel changed.)
run nlm_w10 python benchmarks/nlm_ab.py --modes kernel --d 6
run consistency python tests/tpu_consistency_driver.py
run perf_floors python -m pytest tests/test_perf.py tests/test_tpu_numerics.py -q
run apply_shapes python benchmarks/apply_shapes.py
run workloads python benchmarks/workloads.py --volume --quick
run census python benchmarks/op_census.py --write
run bench python bench.py
log "QUEUE DONE"
