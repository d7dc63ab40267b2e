"""Summarize a bench --step-log JSONL: phase timeline and occupancy budget.

Each event is [kind, t0, t1, mode, num_seqs, num_tokens] with kind in
{dispatch, retire}. Retires are BLOCKING waits on the oldest in-flight
batch, so the retire timeline tiles the wall clock of the busy engine.
"""
import json
import sys
from collections import defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/steplog.jsonl"
evs = [json.loads(l) for l in open(path)]
retires = [e for e in evs if e[0] == "retire"]
if not retires:
    sys.exit("no retire events")
t_start = min(e[1] for e in evs)
t_end = max(e[2] for e in evs)
wall = t_end - t_start

by_mode = defaultdict(lambda: [0.0, 0, 0])  # time, batches, tokens
for e in retires:
    m = by_mode[e[3]]
    m[0] += e[2] - e[1]
    m[1] += 1
    m[2] += e[5]
print(f"wall (first dispatch -> last retire): {wall:.2f} s")
for mode, (t, n, tok) in sorted(by_mode.items()):
    print(f"{mode:8s}: retire-wait {t:8.2f} s over {n:5d} batches, "
          f"{tok:8d} scheduled tokens ({tok/max(t,1e-9):8.0f} tok/s-of-wait)")

# decode occupancy histogram: batch-size buckets weighted by retire time
print("\ndecode retire time by scheduled seqs (bucketed):")
hist = defaultdict(float)
toks = defaultdict(int)
for e in retires:
    if e[3] != "DECODE":
        continue
    b = e[4]
    bucket = min((b + 31) // 32 * 32, 256)
    hist[bucket] += e[2] - e[1]
    toks[bucket] += e[5]
for bucket in sorted(hist):
    t = hist[bucket]
    print(f"  <= {bucket:3d} seqs: {t:7.2f} s  {toks[bucket]:8d} tok "
          f"({toks[bucket]/max(t,1e-9):7.0f} tok/s)")

# timeline thirds: where does the time go over the run
third = wall / 3
phases = [defaultdict(float) for _ in range(3)]
for e in retires:
    k = min(int((e[1] - t_start) / third), 2)
    phases[k][e[3]] += e[2] - e[1]
print("\nretire-wait by wall-clock third:")
for i, ph in enumerate(phases):
    items = " ".join(f"{m}={t:.2f}s" for m, t in sorted(ph.items()))
    print(f"  third {i + 1}: {items}")
