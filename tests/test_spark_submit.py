"""Deployment-shape smoke: the north_rule names `spark-submit --py-files`
as the cluster entry path — run the real crawl driver through it with the
package provided ONLY by the zip (no repo on PYTHONPATH)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile


def test_spark_submit_pyfiles_runs_the_crawl(tmp_path):
    zip_path = str(tmp_path / "nfc.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk("/root/repo/newsfeeds_crawler_spark"):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, "/root/repo"))
    driver = str(tmp_path / "run_crawl.py")
    shutil.copy("/root/repo/tools/run_crawl.py", driver)
    wd = str(tmp_path / "wd")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        ["/opt/spark/bin/spark-submit", "--master", "local[2]",
         "--py-files", zip_path, driver,
         "--workdir", wd, "--feeds", "4", "--items", "3", "--hosts", "2",
         "--epochs", "30"],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
        timeout=280,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["fetched"] > 0 and summary["epochs"] > 0
    assert os.path.isdir(os.path.join(wd, "frontier"))
