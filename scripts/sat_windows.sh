#!/bin/sh
# Sample the tunnel: re-run the satellite amortisation rows every few
# minutes and append timestamped JSON lines.  The remote-attach tunnel
# bandwidth oscillates ~8-40 MB/s on minute timescales (PERF.md round 4),
# so the satellite rows' end-to-end number is window-dependent; this
# records enough samples to report the distribution honestly.
LOG=${1:-/tmp/sat_windows.log}
while true; do
  date -u +"%% %Y-%m-%dT%H:%M:%SZ" >> "$LOG"
  timeout 900 python scripts/bench_matrix.py cfg3_b32 cfg3_scene --reps 3 \
    >> "$LOG" 2>/dev/null
  sleep 240
done
