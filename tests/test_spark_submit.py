"""spark-submit --py-files end-to-end (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Packages the library into a zip, copies the entry script to a neutral
cwd (so nothing resolves from the repo working directory — the zip is
the ONLY way the job can import the engine), submits with pyspark's
own spark-submit at local[4], and asserts the crawl ran, committed,
and printed its stats JSON.
"""

import glob
import json
import os
import shutil
import subprocess
import zipfile

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_crawl(tmp_path):
    zpath = str(tmp_path / "ncs.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for p in glob.glob("nightcrawlercmd_spark/**/*.*", recursive=True, root_dir=REPO):
            if p.endswith((".py", ".json")):
                z.write(os.path.join(REPO, p), arcname=p)
    script = str(tmp_path / "run_crawl.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_crawl.py"), script)
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    state = str(tmp_path / "state")
    cmd = [
        submit, "--master", "local[4]", "--py-files", zpath, script,
        "--state-dir", state, "--max-rounds", "3",
        "--world-hosts", "5", "--world-pages", "10",
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run(
        cmd, capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env
    )
    assert res.returncode == 0, res.stderr[-2000:]
    stats_lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    assert stats_lines, res.stdout[-2000:]
    stats = json.loads(stats_lines[-1])
    assert stats["rounds"] >= 1 and stats["fetched_total"] > 0
    # the state dir carries commit markers — the job is resumable
    assert os.path.isdir(os.path.join(state, "_commits"))
