"""The --py-files artifact: builds, is deterministic, and the zipped
package imports standalone (what spark-submit executors see)."""

import os
import subprocess
import sys


def test_pyfiles_zip(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import package as pk

    out1 = str(tmp_path / "a.zip")
    out2 = str(tmp_path / "b.zip")
    n1 = pk.build(out1)
    n2 = pk.build(out2)
    assert n1 == n2 and n1 > 15
    assert open(out1, "rb").read() == open(out2, "rb").read()  # deterministic

    # importable from the zip alone (fresh interpreter, zip on sys.path)
    code = (
        f"import sys; sys.path.insert(0, {out1!r}); "
        "import osm_poi_cloud_spark.functions.tile_math as tm; "
        "import numpy as np; "
        "print(tm.lon_lat_to_tile(np.float64(0.0), np.float64(0.0), 1))"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=60)
    assert r.returncode == 0, r.stderr
    assert "1" in r.stdout
