"""The committed cis_var_example must stay runnable end-to-end via its
documented run.sh (analogue of the reference's GTEx example,
/root/reference/phaser_pop/cis_var_example/run.sh:1-8)."""

import os
import subprocess

import pandas as pd

EX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "examples", "cis_var_example")


def test_cis_var_example_runs(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(["bash", os.path.join(EX, "run.sh")],
                          capture_output=True, text=True, env=env,
                          timeout=240)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    out = os.path.join(EX, "results.txt")
    try:
        df = pd.read_csv(out, sep="\t")
        assert len(df) == 8                      # one row per test pair
        assert df["var_het_n"].sum() > 0
        assert {"gene", "var_id", "var_het_afc",
                "het_hom_pvalue"} <= set(df.columns)
    finally:
        if os.path.isfile(out):
            os.remove(out)                       # keep the example dir clean
