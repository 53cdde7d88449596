"""Packaging gate: the pipeline runs via spark-submit --py-files
(north_rule: "ships via spark-submit --py-files to a multi-executor
cluster"). The test packages cargo_dupes_spark into dist/pipeline.zip and
submits from a scratch cwd so all imports resolve from the shipped zip, not
the repo checkout."""

from __future__ import annotations

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str | None:
    found = shutil.which("spark-submit")
    if found:
        return found
    try:
        import pyspark

        cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
        return str(cand) if cand.exists() else None
    except ImportError:
        return None


@pytest.mark.slow
def test_spark_submit_pyfiles_stats(tmp_path):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not on PATH")

    subprocess.run(
        ["sh", str(REPO / "scripts" / "package.sh")], check=True, cwd=REPO
    )
    zip_path = REPO / "dist" / "pipeline.zip"
    assert zip_path.exists()

    # scratch cwd: nothing importable from here except the --py-files zip
    workdir = tmp_path / "scratch"
    workdir.mkdir()
    shutil.copy(REPO / "main.py", workdir / "main.py")

    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--py-files", str(zip_path),
            "main.py",
            "--warehouse", str(tmp_path / "wh"),
            "--input", "fixtures",
            "--detectors", "minhash",
            "stats",
        ],
        cwd=workdir,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # the stats command prints the DuplicationStats-analog row
    assert "exact_groups" in proc.stdout, proc.stdout[-2000:]
