"""Run the reference phaser.py end-to-end through phaser_tpu-backed shims.

This turns the reference engine into a live oracle: its only external needs
(samtools/bgzip/tabix/bedtools/bcftools, pysam) are provided by shim
executables in tests/shims/bin backed by our own IO stack.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM_BIN = os.path.join(REPO, "tests", "shims", "bin")
SHIM_PY = os.path.join(REPO, "tests", "shims", "py")
REF_PHASER = "/root/reference/phaser/phaser.py"


def run_reference_phaser(vcf: str, bam: str, sample: str, out_prefix: str,
                         mapq: str = "10", baseq: int = 10,
                         paired_end: str = "1", extra=None,
                         hashseed: str = "0", timeout: int = 600):
    """Returns CompletedProcess; output files land at out_prefix.*"""
    for xbam in bam.split(","):
        bai = xbam + ".bai"
        if xbam and not os.path.exists(bai):
            pathlib.Path(bai).touch()
    env = dict(os.environ)
    env["PATH"] = SHIM_BIN + ":" + env.get("PATH", "")
    env["PYTHONPATH"] = SHIM_PY + ":" + env.get("PYTHONPATH", "")
    env["PHASER_TPU_REPO"] = REPO
    env["PYTHONHASHSEED"] = hashseed
    env.pop("JAX_PLATFORMS", None)
    cmd = [sys.executable, REF_PHASER,
           "--vcf", vcf, "--bam", bam, "--sample", sample,
           "--mapq", str(mapq), "--baseq", str(baseq),
           "--paired_end", str(paired_end), "--o", out_prefix,
           "--threads", "1"]
    for k, v in (extra or {}).items():
        cmd += ["--" + k, str(v)]
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=timeout)
