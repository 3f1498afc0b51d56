"""Guard the examples/full_workflow.py demo from rot (small config)."""

import os
import runpy
import sys


def test_full_workflow_example(tmp_path, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["full_workflow.py", str(tmp_path)])
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "full_workflow.py")
    runpy.run_path(path, run_name="__main__")
    for f in ("matrix.bed.gz", "matrix.gw_phased.bed.gz", "cis_var.txt",
              "compound_hets.txt", "genes.bed",
              os.path.join("s0", "out.vcf.gz")):
        assert os.path.exists(os.path.join(str(tmp_path), f)), f
    hets = open(os.path.join(str(tmp_path), "compound_hets.txt")).read()
    assert len(hets.splitlines()) > 1
