#!/bin/bash
# Full-surface oracle sweep driver: run EVERY queries() entry against
# its DuckDB oracle (scripts/check_correctness.py) in chunks, one
# fresh process (= one fresh ray session) per chunk so RSS stays
# bounded and a crash isolates to its chunk.
#
#   bash scripts/run_sweep.sh [sf_dir] [log] [chunk_size]
#
# Tail line reports total OK / FAIL counts.
set -u
SF_DIR=${1:-/root/testdata/sf0.01}
LOG=${2:-/tmp/sweep.log}
CHUNK=${3:-50}
cd "$(dirname "$0")/.."

python - "$CHUNK" <<'EOF' > /tmp/sweep_chunks.txt
import sys
sys.path.insert(0, '.')
import __ray_entry__ as e
names = list(e.queries())
n = int(sys.argv[1])
for i in range(0, len(names), n):
    print(' '.join(names[i:i+n]))
EOF

: > "$LOG"
i=0
while read -r chunk; do
  printf '=== chunk %02d %s ===\n' "$i" "$(date +%H:%M:%S)" >> "$LOG"
  python scripts/check_correctness.py "$SF_DIR" $chunk >> "$LOG" 2>&1
  i=$((i+1))
done < /tmp/sweep_chunks.txt
echo "=== SWEEP DONE $(date +%H:%M:%S): $(grep -c '^OK' "$LOG") OK / $(grep -c '^FAIL' "$LOG") FAIL (sf=$SF_DIR) ===" >> "$LOG"
tail -1 "$LOG"
