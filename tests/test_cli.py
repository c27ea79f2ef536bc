"""Ship-path tests: the --py-files zip builds and contains the package; the
``python -m wage_etl_spark`` CLI replays a synthetic stream end-to-end and
resumes when re-invoked."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_build_pyfiles_zip(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "build_pyfiles.py")],
        capture_output=True, text=True, cwd=REPO, check=True,
    )
    zpath = out.stdout.strip().splitlines()[-1]
    assert os.path.exists(zpath)
    names = zipfile.ZipFile(zpath).namelist()
    assert "wage_etl_spark/__main__.py" in names
    assert "wage_etl_spark/lake/table.py" in names
    assert all(n.endswith(".py") for n in names)


def test_cli_replay_and_resume(tmp_path):
    wh = str(tmp_path / "wh")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", SPARK_DRIVER_MEMORY="2g")
    cmd = [
        sys.executable, "-m", "wage_etl_spark",
        "--synth-events", "2000", "--warehouse", wh, "--master", "local[4]",
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) >= 1 and all("epoch" in l for l in lines)

    # resume: nothing left to apply
    out2 = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env, timeout=420)
    assert out2.returncode == 0, out2.stderr[-2000:]
    lines2 = [json.loads(l) for l in out2.stdout.splitlines() if l.startswith("{")]
    assert lines2 == []
