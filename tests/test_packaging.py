"""spark-submit --py-files readiness: the package must import and load its
constant tables from inside a zip archive."""

import os
import subprocess
import sys
import zipfile


def test_package_is_zip_importable(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = str(tmp_path / "grenier_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(repo, "grenier_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, repo))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import numpy as np; "
        "from grenier_spark.core import hll, bits; "
        "t = hll.make(0.05); "
        "hll.add_batch(t, bits.wang64(np.arange(1000, dtype=np.uint64))); "
        "print(int(hll.card(t)))" % zpath)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr
    assert int(out.stdout.strip()) > 800
