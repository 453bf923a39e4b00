#!/bin/bash
# Bench noise study: N fresh-process reps of bench.py, loadavg + wall time
# recorded per rep, one JSON line each appended to $OUT.
set -u
OUT="${1:-/root/repo/BENCHNOISE_raw.jsonl}"
REPS="${2:-5}"
cd /root/repo
for i in $(seq 1 "$REPS"); do
  LOAD_BEFORE=$(cut -d' ' -f1-3 /proc/loadavg)
  T0=$(date +%s.%N)
  LINE=$(python bench.py 2>/tmp/benchnoise_stderr_$i.log)
  T1=$(date +%s.%N)
  LOAD_AFTER=$(cut -d' ' -f1-3 /proc/loadavg)
  python - "$i" "$T0" "$T1" "$LOAD_BEFORE" "$LOAD_AFTER" "$LINE" <<'PYEOF' >> "$OUT"
import json, sys
i, t0, t1, lb, la, line = sys.argv[1:7]
d = json.loads(line)
d["rep"] = int(i)
d["wall_sec"] = round(float(t1) - float(t0), 1)
d["load_before"] = lb
d["load_after"] = la
print(json.dumps(d))
PYEOF
  echo "rep $i done" >&2
done
