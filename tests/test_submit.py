"""spark-submit --py-files launch path (north-rule deployment protocol).

BASELINE.md's protocol runs the engine as
``spark-submit --py-files dist/engine.zip <job>.py``; these tests prove the
artifact and the launch path actually work: the packager's zip is
deterministic and zipimport-complete, and a REAL ``spark-submit`` child
process (pyspark's own launcher, its own JVM) resolves the engine from the
zip alone — the repo checkout is NOT importable from the job's cwd or
script dir, exactly the situation on a cluster worker.
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_make_dist():
    spec = importlib.util.spec_from_file_location(
        "make_dist", os.path.join(REPO, "scripts", "make_dist.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_engine_zip_deterministic_and_complete(tmp_path):
    md = _load_make_dist()
    z1 = md.build(str(tmp_path / "a.zip"))
    z2 = md.build(str(tmp_path / "b.zip"))
    assert open(z1, "rb").read() == open(z2, "rb").read()

    names = set(zipfile.ZipFile(z1).namelist())
    # every package module on disk is in the archive
    for dirpath, dirnames, filenames in os.walk(
            os.path.join(REPO, "graph_data_science_spark")):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if fn.endswith(".py"):
                arc = os.path.relpath(os.path.join(dirpath, fn), REPO)
                assert arc in names, arc
    # and nothing else leaked in
    assert all(n.startswith("graph_data_science_spark/") for n in names)

    # zipimport (the --py-files mechanism) can import the whole package
    # tree from the archive in a clean interpreter
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import graph_data_science_spark.operators.pagerank, "
        "graph_data_science_spark.sources.repo_source, "
        "graph_data_science_spark.plans.pregel, "
        "graph_data_science_spark.streaming.events as _e, "
        "graph_data_science_spark.ml.pipelines as _p; "
        "import graph_data_science_spark as g; print(g.__file__)" % z1
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=str(tmp_path),
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "a.zip" in out.stdout


def test_spark_submit_pyfiles_end_to_end(tmp_path):
    """Real spark-submit child JVM; engine resolves from the zip only."""
    spark_submit = os.path.join(os.path.dirname(pyspark.__file__),
                                "bin", "spark-submit")
    if not os.path.exists(spark_submit):
        pytest.skip("pyspark launcher not present in this env")

    md = _load_make_dist()
    engine_zip = md.build(str(tmp_path / "engine.zip"))
    # copy the job script out of the repo so neither cwd nor the script's
    # directory makes the checkout importable
    job = tmp_path / "submit_smoke.py"
    shutil.copyfile(os.path.join(REPO, "scripts", "submit_smoke.py"), job)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.session.timeZone=UTC",
         "--py-files", engine_zip, str(job)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=540)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["imported_from_zip"], res
    assert "engine.zip" in res["package_file"], res
    assert res["sha_mismatches"] == 0
    assert res["n_components"] == 1
    assert res["master"] == "local[2]"
