"""phaser_expr_matrix-compatible CLI (/root/reference/phaser_pop/
phaser_expr_matrix.py:11-15)."""

import argparse
import sys

from ..analysis.expr_matrix import run_expr_matrix


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="phaser_expr_matrix")
    p.add_argument("--gene_ae_dir", required=True)
    p.add_argument("--features", required=True)
    p.add_argument("--t", type=int, default=1)
    p.add_argument("--o", required=True)
    args = p.parse_args(argv)
    run_expr_matrix(args.gene_ae_dir, args.features, args.o)
    return 0


if __name__ == "__main__":
    sys.exit(main())
