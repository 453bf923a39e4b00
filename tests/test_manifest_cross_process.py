"""Cross-PROCESS commit races (VERDICT r8 #3): the thread race in
test_manifest.py proves in-process serialization, but concurrent
writers actually deploy as separate drivers (separate OS processes,
separate JVMs).  ``os.link``/``O_EXCL`` claims are cross-process
atomic by POSIX contract — these tests prove the ENGINE's retry path
on top of them: two OS processes hammering the same table must lose
no update and produce strictly monotonic versions.

Two layers, deliberately:

* a pure-CAS race at the ``_commit`` layer (no Spark in the child —
  the commit object is driver-side JSON), which affords hundreds of
  genuinely interleaved commit attempts per second, far more
  collision coverage than any Spark-staged workload could generate;
* one full ``append_batch`` race with a REAL second SparkSession in
  the child process — the deployment shape itself (two drivers, two
  JVMs, one table), proving staging + ledger + retry end-to-end.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.manifest import (
    CommitConflict,
    CoordinatorClaimBackend,
    ManifestTable,
    PosixLinkBackend,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mkdf(spark, rows):
    df = spark.createDataFrame(
        rows, "ticker string, trade_date string, close double")
    return df.withColumn("trade_date", F.col("trade_date").cast("date"))


# -- layer 1: pure-CAS cross-process race (no Spark in the child) ----

_CAS_CHILD = """
import json, os, sys
sys.path.insert(0, {repo!r})
from stock_market_data_pipeline_spark.manifest import (
    CommitConflict, CoordinatorClaimBackend, ManifestTable,
    PosixLinkBackend)

backend = (CoordinatorClaimBackend() if {kind!r} == "coordinator"
           else PosixLinkBackend())
t = ManifestTable({root!r}, "trade_date", backend=backend)
# start barrier: announce readiness, then spin until the parent fires
# the gun — both processes must actually overlap for the race to race
import time
open({root!r} + "/.ready", "w").close()
while not os.path.exists({root!r} + "/.go"):
    time.sleep(0.002)
wins = conflicts = 0
for _ in range({n}):
    while True:
        mf = t._raw()
        try:
            t._commit(dict(mf["partitions"]),
                      base_version=mf["version"],
                      streams={{**mf.get("streams", {{}}),
                               "sub": wins}},
                      schema=mf.get("schema"))
            wins += 1
            break
        except CommitConflict:
            conflicts += 1
print(json.dumps({{"wins": wins, "conflicts": conflicts}}))
"""


@pytest.mark.parametrize("kind", ["posix", "coordinator"])
def test_cross_process_cas_no_lost_updates(spark, tmp_path, kind):
    """Two OS processes race N optimistic commits each from live
    reads of the same table.  Every claim collision must surface as
    CommitConflict (never a lost update): the final version is
    EXACTLY base + 2N, both ledger counters land at their high-water
    marks, and at least one real cross-process collision occurred
    (else the race never happened and the test proves nothing)."""
    backend = (CoordinatorClaimBackend() if kind == "coordinator"
               else PosixLinkBackend())
    root = str(tmp_path / "xproc")
    t = ManifestTable.create(
        _mkdf(spark, [("AAA", "2024-01-02", 1.0)]), root,
        ts="trade_date", backend=backend)
    n = 40
    child = subprocess.Popen(
        [sys.executable, "-c",
         _CAS_CHILD.format(repo=REPO, root=root, n=n, kind=kind)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    # wait for the child to finish importing, then fire the gun so
    # both processes commit CONCURRENTLY (without the barrier the
    # child's ~1 s interpreter startup lets main finish unopposed and
    # the "race" never overlaps)
    import time
    for _ in range(3000):
        if os.path.exists(os.path.join(root, ".ready")):
            break
        time.sleep(0.01)
    else:
        child.kill()
        pytest.fail("child never became ready")
    open(os.path.join(root, ".go"), "w").close()
    wins = conflicts = 0
    for _ in range(n):
        while True:
            mf = t._raw()
            try:
                t._commit(dict(mf["partitions"]),
                          base_version=mf["version"],
                          streams={**mf.get("streams", {}),
                                   "main": wins},
                          schema=mf.get("schema"))
                wins += 1
                break
            except CommitConflict:
                conflicts += 1
    out, err = child.communicate(timeout=120)
    assert child.returncode == 0, err
    sub = json.loads(out.strip().splitlines()[-1])
    assert sub["wins"] == n
    # no lost update: every one of the 2N commits owns a distinct
    # version, and the live version is exactly base + 2N
    assert t.version() == 1 + 2 * n
    # a successful commit's base was the latest at claim time, so the
    # overall-last commit merged BOTH final counters: both ledgers at
    # their high-water marks proves no commit was lost either side
    assert t._raw()["streams"] == {"main": n - 1, "sub": n - 1}
    # the race was real: someone actually collided
    assert conflicts + sub["conflicts"] > 0
    # data untouched by the metadata race
    assert t.read(spark).count() == 1


# -- layer 2: two real Spark drivers through append_batch ------------

_SPARK_CHILD = """
import json, os, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from stock_market_data_pipeline_spark.manifest import ManifestTable

spark = (SparkSession.builder.master("local[2]")
         .appName("xproc-child")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.driver.memory", "1500m")
         .getOrCreate())
t = ManifestTable({root!r}, "trade_date")
for bid in range({nb}):
    rows = [("S%d" % bid, "2024-01-0%d" % (bid % 3 + 2), float(bid))]
    df = (spark.createDataFrame(
        rows, "ticker string, trade_date string, close double")
        .withColumn("trade_date", F.col("trade_date").cast("date")))
    assert t.append_batch(df, "sub", bid) is True
print(json.dumps({{"ok": True, "version": t.version()}}))
spark.stop()
"""


def test_cross_process_append_batch_race(spark, tmp_path):
    """The deployment shape itself: a SECOND DRIVER (child process,
    own JVM) pushes batches through append_batch while this process
    does the same.  No batch may be lost or doubled across process
    boundaries; both stream ledgers land at their high-water marks;
    versions advance by exactly one per committed batch."""
    root = str(tmp_path / "xspark")
    t = ManifestTable.create(
        _mkdf(spark, [("AAA", "2024-01-02", 1.0)]), root,
        ts="trade_date")
    nb = 3
    child = subprocess.Popen(
        [sys.executable, "-c",
         _SPARK_CHILD.format(repo=REPO, root=root, nb=nb)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    for bid in range(nb):
        rows = [("M%d" % bid, "2024-01-0%d" % (bid % 3 + 2),
                 float(bid))]
        assert t.append_batch(_mkdf(spark, rows), "main", bid) is True
    out, err = child.communicate(timeout=300)
    assert child.returncode == 0, err[-2000:]
    assert json.loads(out.strip().splitlines()[-1])["ok"] is True
    # every batch from BOTH processes landed exactly once
    got = sorted(r.ticker for r in t.read(spark).collect())
    assert got == sorted(
        ["AAA"] + [f"M{i}" for i in range(nb)]
        + [f"S{i}" for i in range(nb)])
    assert t._raw()["streams"] == {"main": nb - 1, "sub": nb - 1}
    assert t.version() == 1 + 2 * nb     # one commit per batch


# -- layer 3: two real Spark drivers racing merge-on-read deletes ----

_DV_CHILD = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from stock_market_data_pipeline_spark.manifest import (
    CommitConflict, ManifestTable)

spark = (SparkSession.builder.master("local[2]")
         .appName("xproc-dv-child")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.driver.memory", "1500m")
         .getOrCreate())
t = ManifestTable({root!r}, "trade_date")
open({root!r} + "/.ready", "w").close()
while not os.path.exists({root!r} + "/.go"):
    time.sleep(0.002)
retries = 0
while True:
    try:
        out = t.delete_where(spark, "close = 2.0", mode="dv")
        break
    except CommitConflict:
        retries += 1
print(json.dumps({{"deleted": out["rows_deleted"],
                  "retries": retries}}))
spark.stop()
"""


def test_cross_process_dv_delete_race(spark, tmp_path):
    """Two OS processes (two Spark drivers) race merge-on-read deletes
    of DISJOINT predicates over the SAME partition.  Positional
    addresses make this the sharpest conflict shape: the loser's DV
    commit lands on a ref whose dv-set changed under it, must surface
    CommitConflict (the (shard, dv) fingerprint — a shard-only check
    would silently merge both and double-apply nothing but also never
    conflict), and the retried delete_where re-reads THROUGH the
    winner's DVs so each row dies exactly once."""
    import time

    root = str(tmp_path / "xdv")
    rows = [("T%d" % i, "2024-01-02", float(i)) for i in range(1, 5)]
    t = ManifestTable.create(_mkdf(spark, rows), root,
                             ts="trade_date")
    child = subprocess.Popen(
        [sys.executable, "-c", _DV_CHILD.format(repo=REPO, root=root)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    for _ in range(6000):
        if os.path.exists(os.path.join(root, ".ready")):
            break
        time.sleep(0.01)
    else:
        child.kill()
        pytest.fail("child never became ready")
    open(os.path.join(root, ".go"), "w").close()
    retries = 0
    while True:
        try:
            out = t.delete_where(spark, "close = 1.0", mode="dv")
            break
        except CommitConflict:
            retries += 1
    sub_out, err = child.communicate(timeout=300)
    assert child.returncode == 0, err[-2000:]
    sub = json.loads(sub_out.strip().splitlines()[-1])
    # each side deleted exactly its own row, no double-kill, no loss
    assert out["rows_deleted"] == 1 and sub["deleted"] == 1
    got = sorted(r.close for r in t.read(spark).collect())
    assert got == [3.0, 4.0]
    ref = t._raw()["partitions"]["2024-01-02"]
    assert ref["dv_rows"] == 2 and len(ref["dv"]) == 2
    # no data file was rewritten by either process
    assert ref["files"] == t._raw()["partitions"]["2024-01-02"]["files"]
