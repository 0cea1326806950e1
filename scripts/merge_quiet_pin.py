"""Merge a verified-quiet bench run into BENCH_QUIET_BASELINE.json
under the never-loosen discipline: existing pins only TIGHTEN
(min(old, new)), new queries enter at the run's value. Refuses
contended runs. Usage:
    python scripts/merge_quiet_pin.py /path/to/bench_output.log
The log's last line must contain the bench JSON.
"""
import json
import re
import sys

PIN = "/root/repo/BENCH_QUIET_BASELINE.json"

raw = open(sys.argv[1]).read()
m = re.findall(r'\{"metric".*\}', raw)
assert m, "no bench JSON found in log"
run = json.loads(m[-1])
assert run["contended"] is False, f"run is contended: refuse to pin"
assert not run["failed"], f"run had failures: {run['failed']}"

pin = json.load(open(PIN))
pq, rq = pin["queries"], run["queries"]
tightened, added = [], []
for k, v in rq.items():
    if k not in pq:
        pq[k] = v
        added.append(k)
    elif v < pq[k]:
        pq[k] = v
        tightened.append(k)
pin["value"] = round(sum(pq.values()), 3)
pin["n_ok"] = len(pq)
pin["n_requested"] = len(pq)
for meta in ("start_loadavg_1m", "cpus", "sf"):
    if meta in run:
        pin[meta] = run[meta]
json.dump(pin, open(PIN, "w"))
print(
    f"pinned {len(pq)} queries: {len(added)} added "
    f"({sorted(added)}), {len(tightened)} tightened; "
    f"pin sum {pin['value']}s"
)
