"""Sum driver-side gaps between consecutive Spark jobs in an event log:
the wall time where NO job is running = scheduling/planning/py4j serial
floor. Usage: python scripts/job_gaps.py [latest]"""
import glob, json, os, sys

path = sys.argv[1] if len(sys.argv) > 1 else "latest"
if path == "latest":
    d = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local") + "/spark-events"
    path = sorted(glob.glob(d + "/*"), key=os.path.getmtime)[-1]
if os.path.isdir(path):
    path = sorted([f for f in glob.glob(path + "/*") if "appstatus" not in f],
                  key=os.path.getmtime)[-1]
jobs = []
for line in open(path):
    try:
        ev = json.loads(line)
    except json.JSONDecodeError:
        continue
    if ev.get("Event") == "SparkListenerJobStart":
        jobs.append([ev["Job ID"], ev["Submission Time"], None])
    elif ev.get("Event") == "SparkListenerJobEnd":
        for j in jobs:
            if j[0] == ev["Job ID"]:
                j[2] = ev["Completion Time"]
# merge job intervals; busy = union length; span = last end - first start
iv = sorted((j[1], j[2]) for j in jobs if j[2])
busy, cur_s, cur_e = 0, None, None
for s, e in iv:
    if cur_e is None or s > cur_e:
        if cur_e is not None:
            busy += cur_e - cur_s
        cur_s, cur_e = s, e
    else:
        cur_e = max(cur_e, e)
busy += (cur_e - cur_s) if cur_e else 0
span = iv[-1][1] - iv[0][0] if iv else 0
print(f"jobs={len(jobs)} span={span/1000:.1f}s busy={busy/1000:.1f}s "
      f"driver_gaps={(span-busy)/1000:.1f}s")
