#!/usr/bin/env python
"""Per-query job/stage breakdown for the headline suite via the Spark
event log: run each query N times (noop sink), bracketed by job-group
labels, then parse the event log to attribute jobs/stages/tasks to
queries.

Usage: python tools/r14_profile.py [name ...]   (default: bench.HEADLINE)
Prints, per query: jobs, stages, tasks, sum of task time, wall per run,
and the per-stage top costs of the FASTEST run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

EVDIR = "/tmp/r14_spark_events"


def main() -> None:
    names = sys.argv[1:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = int(os.environ.get("R14_PROFILE_ROUNDS", "3"))

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark import queries as battery

    spark = get_spark(
        "r14-profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext
    qs = dict(battery.queries())
    for name, setup in (
        ("similarity_ivfpq", bench._setup_ivfpq),
        ("bm25_phrase_probe", bench._setup_phrase),
    ):
        if name in names:
            qs[name] = setup(spark, sf_dir)

    walls: dict[str, list[float]] = defaultdict(list)
    # warmup (codegen etc.) outside labels
    sc.setJobGroup("warmup", "warmup")
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for r in range(rounds):
        for name in names:
            sc.setJobGroup(f"{name}#{r}", name)
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls[name].append(round(time.monotonic() - t0, 3))
    sc.setJobGroup("tail", "tail")
    spark.stop()

    # ---- parse event log -------------------------------------------------
    ev_files = []
    for root, _, files in os.walk(EVDIR):
        ev_files += [
            os.path.join(root, f) for f in files if "events" in f
        ]
    ev = max(ev_files, key=os.path.getsize)
    job_group: dict[int, str] = {}
    job_stages: dict[int, list[int]] = {}
    job_span: dict[int, list[float]] = {}
    stage_info: dict[int, dict] = {}
    with open(ev) as f:
        for line in f:
            e = json.loads(line)
            t = e.get("Event")
            if t == "SparkListenerJobStart":
                jid = e["Job ID"]
                job_group[jid] = e.get("Properties", {}).get(
                    "spark.jobGroup.id", "?"
                )
                job_stages[jid] = [
                    s["Stage ID"] for s in e.get("Stage Infos", [])
                ]
                job_span[jid] = [e["Submission Time"], 0.0]
            elif t == "SparkListenerJobEnd":
                jid = e["Job ID"]
                if jid in job_span:
                    job_span[jid][1] = e["Completion Time"]
            elif t == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                stage_info[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "ms": (si.get("Completion Time", 0) or 0)
                    - (si.get("Submission Time", 0) or 0),
                }

    per_q: dict[str, dict] = defaultdict(
        lambda: {"jobs": 0, "stages": 0, "tasks": 0, "job_ms": 0,
                 "gap_ms": 0, "stage_list": []}
    )
    # group jobs by (query, run) to compute inter-job gaps
    run_jobs: dict[str, list[int]] = defaultdict(list)
    for jid, grp in job_group.items():
        if "#" not in grp:
            continue
        run_jobs[grp].append(jid)
    for grp, jids in run_jobs.items():
        name = grp.rsplit("#", 1)[0]
        q = per_q[name]
        jids.sort()
        spans = [job_span[j] for j in jids if job_span[j][1]]
        q["jobs"] += len(jids)
        q["job_ms"] += sum(s[1] - s[0] for s in spans)
        for a, b in zip(spans, spans[1:]):
            q["gap_ms"] += max(0, b[0] - a[1])
        for j in jids:
            for sid in job_stages.get(j, []):
                if sid in stage_info:
                    q["stages"] += 1
                    q["tasks"] += stage_info[sid]["tasks"]
                    q["stage_list"].append((sid, stage_info[sid]))

    nrounds = rounds
    print(f"{'query':28s} {'wall_min':>8s} {'jobs':>5s} {'stages':>6s} "
          f"{'tasks':>6s} {'job_s':>6s} {'gap_s':>6s}")
    for name in names:
        q = per_q[name]
        print(
            f"{name:28s} {min(walls[name]):8.3f} {q['jobs']/nrounds:5.1f} "
            f"{q['stages']/nrounds:6.1f} {q['tasks']/nrounds:6.0f} "
            f"{q['job_ms']/nrounds/1000:6.2f} {q['gap_ms']/nrounds/1000:6.2f}"
        )
    if os.environ.get("R14_PROFILE_STAGES"):
        for name in names:
            print(f"\n=== {name} stages (all runs)")
            for sid, si in sorted(per_q[name]["stage_list"]):
                print(f"  s{sid:4d} {si['ms']:6d}ms {si['tasks']:4d}t "
                      f"{si['name']}")


if __name__ == "__main__":
    main()
