"""Parse a Spark event log and print the heaviest stages (task-time sum,
wall duration, IO/shuffle bytes). Run a job with SPARK_GRAFT_EVENTLOG=1
first; logs land in $SPARK_GRAFT_LOCAL_DIR/spark-events.

Usage: python scripts/stage_profile.py [event_log_path|latest] [top_n]
"""

from __future__ import annotations

import glob
import json
import os
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "latest"
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

if path == "latest":
    d = os.environ.get("SPARK_GRAFT_LOCAL_DIR",
                       "/dev/shm/spark-local") + "/spark-events"
    files = sorted(glob.glob(d + "/*"), key=os.path.getmtime)
    path = files[-1]
if os.path.isdir(path):
    cands = [f for f in glob.glob(path + "/*") if "appstatus" not in f]
    path = sorted(cands, key=os.path.getmtime)[-1]

def _open(p):
    if p.endswith(".zstd"):
        import io
        import subprocess
        try:
            import zstandard
            return io.TextIOWrapper(
                zstandard.ZstdDecompressor().stream_reader(open(p, "rb")))
        except ImportError:
            pr = subprocess.Popen(["zstd", "-dc", p],
                                  stdout=subprocess.PIPE)
            return io.TextIOWrapper(pr.stdout)
    return open(p)


stages = {}
with _open(path) as f:
    for line in f:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time", 0)
            comp = si.get("Completion Time", 0)
            st = stages.setdefault(sid, {})
            st.update({
                "name": si["Stage Name"].split("\n")[0][:70],
                "wall_s": round((comp - sub) / 1000, 1),
                "tasks": si["Number of Tasks"],
            })
        elif ev.get("Event") == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            st = stages.setdefault(sid, {"name": "?", "wall_s": 0, "tasks": 0})
            m = ev.get("Task Metrics") or {}
            st["task_s"] = st.get("task_s", 0) + m.get("Executor Run Time", 0) / 1000
            st["gc_s"] = st.get("gc_s", 0) + m.get("JVM GC Time", 0) / 1000
            st["cpu_s"] = st.get("cpu_s", 0) + m.get("Executor CPU Time", 0) / 1e9
            inp = (m.get("Input Metrics") or {}).get("Bytes Read", 0)
            sw = (m.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written", 0)
            sr = (m.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read", 0) + \
                 (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
            st["in_mb"] = st.get("in_mb", 0) + inp / 1e6
            st["sw_mb"] = st.get("sw_mb", 0) + sw / 1e6
            st["sr_mb"] = st.get("sr_mb", 0) + sr / 1e6

rows = sorted(stages.items(), key=lambda kv: -kv[1].get("task_s", 0))[:top_n]
total_task = sum(s.get("task_s", 0) for s in stages.values())
total_wall = sum(s.get("wall_s", 0) for s in stages.values())
print(f"stages={len(stages)} total_task_s={total_task:.0f} "
      f"sum_stage_wall_s={total_wall:.0f}")
print(f"{'sid':>4} {'wall':>6} {'task_s':>7} {'cpu_s':>7} {'gc':>5} "
      f"{'in_mb':>7} {'sw_mb':>7} {'sr_mb':>7}  name")
for sid, s in rows:
    print(f"{sid:>4} {s.get('wall_s',0):>6} {s.get('task_s',0):>7.1f} "
          f"{s.get('cpu_s',0):>7.1f} {s.get('gc_s',0):>5.1f} "
          f"{s.get('in_mb',0):>7.0f} {s.get('sw_mb',0):>7.0f} "
          f"{s.get('sr_mb',0):>7.0f}  {s.get('name','?')} ({s.get('tasks',0)}t)")
