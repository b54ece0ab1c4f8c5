"""Two-PROCESS publish race for the index store's OCC claim (VERDICT r12
item 4): commit_replace's per-tag idempotency was only ever exercised
in-process — here two real OS processes, each with its OWN SparkSession
and JVM, race a commit_replace against one SnapshotTable family:

  * same tag  -> EXACTLY one version published (the loser discovers the
    winner's tag on rebase and no-ops), and the survivor's data is one
    writer's intact frame (never interleaved);
  * distinct tags -> both publish, distinct versions, both readable;
  * the manifest chain stays readable by a third reader afterwards.

The barrier file makes both writers commit as close to simultaneously
as Python allows — both have built their data frames and block on one
poll loop before calling commit_replace.
"""

import json
import os
import subprocess
import sys
import time

import pytest

_WRITER = r"""
import json, os, sys, time

store, writer_id, tag, barrier = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"race-writer-{writer_id}")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
df = spark.createDataFrame(
    [(i, writer_id) for i in range(50)], "k long, writer string"
)

sys.path.insert(0, os.environ["RACE_REPO"])
from etl_financial_report_spark.sources.snapshots import SnapshotTable

st = SnapshotTable(store)
print("READY", flush=True)
deadline = time.time() + 60
while not os.path.exists(barrier):
    if time.time() > deadline:
        print(json.dumps({"error": "barrier timeout"}), flush=True)
        sys.exit(2)
    time.sleep(0.005)

version = st.commit_replace(df, tag=tag)
print("RESULT " + json.dumps({"writer": writer_id, "version": version}), flush=True)
spark.stop()
"""


def _launch(tmp_path, store, writer_id, tag, barrier):
    script = tmp_path / f"writer_{writer_id}.py"
    script.write_text(_WRITER)
    env = dict(os.environ, RACE_REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return subprocess.Popen(
        [sys.executable, str(script), store, writer_id, tag, barrier],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        env=env,
    )


def _run_race(tmp_path, store, tags):
    barrier = str(tmp_path / "go")
    procs = [
        _launch(tmp_path, store, wid, tag, barrier)
        for wid, tag in (("a", tags[0]), ("b", tags[1]))
    ]
    # wait for both writers to be frame-built and poised on the barrier
    for p in procs:
        line = p.stdout.readline()
        assert line.strip() == "READY", f"writer failed to start: {line!r}"
    open(barrier, "w").close()  # release both at once
    results = {}
    for p in procs:
        out, _ = p.communicate(timeout=180)
        assert p.returncode == 0, f"writer crashed: {out}"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["writer"]] = r["version"]
    assert set(results) == {"a", "b"}, f"missing writer results: {results}"
    os.unlink(barrier)
    return results


@pytest.mark.slow
def test_two_process_same_tag_publishes_exactly_once(spark, tmp_path):
    from etl_financial_report_spark.sources.snapshots import SnapshotTable

    store = str(tmp_path / "race_store")
    results = _run_race(tmp_path, store, ("shared-tag", "shared-tag"))
    published = {w: v for w, v in results.items() if v is not None}
    assert len(published) == 1, (
        f"same-tag race must publish EXACTLY once, got {results}"
    )
    st = SnapshotTable(store)
    vs = st.versions()
    tagged = [v for v in vs if st._read_manifest(v).get("tag") == "shared-tag"]
    assert len(tagged) == 1, f"one manifest must carry the tag, got {tagged}"
    rows = SnapshotTable(store).read(spark, tagged[0]).collect()
    writers = {r["writer"] for r in rows}
    # the surviving snapshot is ONE writer's intact frame, never a blend
    assert len(rows) == 50 and len(writers) == 1
    assert next(iter(writers)) == next(iter(published))


@pytest.mark.slow
def test_two_process_distinct_tags_both_publish(spark, tmp_path):
    from etl_financial_report_spark.sources.snapshots import SnapshotTable

    store = str(tmp_path / "race_store2")
    results = _run_race(tmp_path, store, ("tag-a", "tag-b"))
    assert all(v is not None for v in results.values()), (
        f"distinct tags must both publish: {results}"
    )
    assert results["a"] != results["b"], "distinct versions required"
    st = SnapshotTable(store)
    tag_of = {st._read_manifest(v).get("tag"): v for v in st.versions()}
    assert {"tag-a", "tag-b"} <= set(tag_of)
    # every historical version stays readable (time travel under races)
    for tag, wid in (("tag-a", "a"), ("tag-b", "b")):
        rows = st.read(spark, tag_of[tag]).collect()
        assert len(rows) == 50 and {r["writer"] for r in rows} == {wid}
