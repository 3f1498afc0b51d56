"""pysam shim backed by phaser_tpu.io.tabix.

phaser.py only imports pysam; phaser_cis_var/annotate use
pysam.Tabixfile(path).fetch(chrom, start, end) -> iterable of text lines.
"""

import os
import sys

sys.path.insert(0, os.environ.get("PHASER_TPU_REPO", "/root/repo"))


class Tabixfile:
    def __init__(self, path, mode="r"):
        from phaser_tpu.io.tabix import TabixFile
        self._tf = TabixFile(path)

    def fetch(self, chrom, start, end):
        return self._tf.fetch(str(chrom), int(start), int(end))
