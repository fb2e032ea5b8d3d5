#!/bin/bash
# 100x scale rung: 24,000,000 docs (SCALE10_BASE_DOCS=50000 x 480
# replicas) through the same staged harness as the 10x rung
# (scripts/scale_proof_r5.py) — fresh process per stage, one JSON
# line each with wall / peak driver RSS / spill / checksums.
#
# The curate stage runs THREE tiers at this rung: at 3.45M dup-group
# rows the default 1M budget makes `auto` resolve to the JOIN tier
# (the production path at corpus scale), `broadcast` is forced via a
# raised budget, and `join` is forced explicitly — all three final
# checksums must agree.
set -u
export SCALE10_BASE_DOCS=50000
export SCALE10_DIR=${SCALE10_DIR:-/tmp/scale100}
export SCALE10_FLAGSHIP_REPL=4800
# 72 GiB object store (126 GB /dev/shm): the 24M-doc LSH shuffle peaks
# past the default 37.6 GiB store, and this sandbox's disk (93 GB
# usable) cannot absorb the ~35+ GB spill without tripping Ray's 95%
# disk-utilization kill — size the store to the rung instead of
# spilling. On a real cluster this pressure spreads over nodes.
export SCALE10_OBJ_STORE_GB=${SCALE10_OBJ_STORE_GB:-72}
LOG=${1:-scripts/scale_proof_r5_24m.log}
shift || true
cd "$(dirname "$0")/.."
mkdir -p "$SCALE10_DIR"

run_stage() {
  echo "--- stage: $* $(date +%H:%M:%S) ---" >> "$LOG"
  python scripts/scale_proof_r5.py "$@" >> "$LOG" 2>&1
}

# One curate tier's staged-phase parquet is ~35-45 GB at this rung —
# the previous tier's scratch (and the minhash stage's signature
# table) must be gone before the next tier's shuffles need the disk
# for spill. The STAGED (production) shape is proven on the auto
# tier; the forced broadcast/join tiers run in the in-memory tier
# and must reproduce the same final checksum.
clean_scratch() {
  rm -rf "$SCALE10_DIR"/curate_stage_* "$SCALE10_DIR"/signatures
  # the previous session's plasma file can outlive its process by a
  # few seconds; ray.init sizes the store against CURRENT free shm,
  # so wait until /dev/shm has room for the configured store again
  need_kb=$(( (SCALE10_OBJ_STORE_GB + 6) * 1024 * 1024 ))
  for _ in $(seq 1 60); do
    avail_kb=$(df --output=avail /dev/shm | tail -1 | tr -d ' ')
    [ "$avail_kb" -ge "$need_kb" ] && break
    sleep 5
  done
}

# With stage args (e.g. `... log minhash curate:auto`), resume those
# stages only and APPEND to the log; with none, run the full ladder.
run_named() {
  case "$1" in
    curate:auto) clean_scratch; run_stage curate --exact-keep auto ;;
    curate:broadcast) clean_scratch; run_stage curate --exact-keep broadcast --broadcast-budget 10000000 --no-staging ;;
    curate:join) clean_scratch; run_stage curate --exact-keep join --no-staging ;;
    flagship) clean_scratch; run_stage flagship ;;
    *) run_stage "$1" ;;
  esac
}

if [ $# -gt 0 ]; then
  for s in "$@"; do run_named "$s"; done
else
  : > "$LOG"
  for s in gen census exact minhash curate:auto curate:broadcast curate:join flagship; do
    run_named "$s"
  done
fi
echo "--- ALL DONE $(date +%H:%M:%S) ---" >> "$LOG"
