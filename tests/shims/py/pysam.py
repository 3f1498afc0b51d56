"""Import stub for pysam: the reference phaser.py imports pysam at module
level but never uses it (it shells out instead). Downstream reference tools
that DO use pysam are not run through this stub."""
