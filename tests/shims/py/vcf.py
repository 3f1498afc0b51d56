"""pyVCF import stub for the reference phaser_annotate.py (only used when
--af_vcf is passed, which the oracle runs avoid)."""


class Reader:
    def __init__(self, filename=None):
        raise NotImplementedError("pyVCF shim: --af_vcf not supported")
